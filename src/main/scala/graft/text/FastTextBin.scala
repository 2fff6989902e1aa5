package graft.text

import java.nio.{ByteBuffer, ByteOrder}

/** Reader for the public fastText BINARY model format (`.bin`) — the
  * artifact `Latanova_v1.py:19-21` actually loads (gensim wraps the
  * same file). Layout per the published fastText sources
  * (facebookresearch/fasttext: `fasttext.cc loadModel`,
  * `args.cc Args::load`, `dictionary.cc Dictionary::load`,
  * `densematrix.cc DenseMatrix::load`), little-endian:
  *
  * {{{
  *   int32 magic = 793712314, int32 version (<= 12)
  *   args: dim ws epoch minCount neg wordNgrams loss model bucket
  *         minn maxn lrUpdateRate (int32 each), t (float64)
  *   dict: size nwords nlabels (int32), ntokens pruneidxSize (int64)
  *         then per entry: word bytes until NUL, count (int64),
  *         type (int8); then pruneidxSize (int32,int32) pairs
  *   quantInput (int8; quantized models rejected here)
  *   input matrix: rows cols (int64), rows*cols float32
  * }}}
  *
  * Word vectors follow fastText's own semantics: an IN-VOCAB word is
  * the mean of its input-matrix row plus its char-n-gram bucket rows;
  * an OOV word is the mean of its n-gram bucket rows alone — real
  * subword composition from the trained bucket matrix, not a stand-in.
  * N-gram ids are FNV-1a-32 hashes (signed-char fold, exactly
  * `Dictionary::hash`) mod `bucket`, offset by nwords; n-gram
  * extraction is UTF-8 aware (continuation bytes never start a gram),
  * matching `Dictionary::computeSubwords`.
  *
  * The model is a DRIVER-side artifact (like a centroid set or merge
  * table): load once, broadcast; executors look vectors up through the
  * [[Embedder]] interface. A 300-dim 2M-bucket model is ~2.4 GB —
  * within broadcast range on a real cluster; the loader never touches
  * Spark, so it cannot shuffle. */
object FastTextBin {

  final val Magic = 793712314
  final val Eos = "</s>"
  final val Bow = "<"
  final val Eow = ">"

  final case class Model(dim: Int, minn: Int, maxn: Int, bucket: Int,
                         wordNgrams: Int,
                         words: Array[String], labels: Array[String],
                         matrix: Array[Float], rows: Long,
                         output: Array[Float] = Array.empty,
                         outputRows: Long = 0L) {
    private[text] val wordIndex: Map[String, Int] =
      words.iterator.zipWithIndex.toMap
    def nwords: Int = words.length

    private def addRow(acc: Array[Double], id: Int): Unit = {
      val off = id.toLong * dim
      var j = 0
      while (j < dim) { acc(j) += matrix((off + j).toInt); j += 1 }
    }

    /** fastText `getWordVector`: mean of the word's subword rows. */
    def vector(word: String): Array[Double] = {
      val acc = new Array[Double](dim)
      var n = 0
      wordIndex.get(word) match {
        case Some(id) =>
          addRow(acc, id); n += 1
          if (maxn > 0 && word != Eos) {
            subwordIds(word).foreach { g => addRow(acc, g); n += 1 }
          }
        case None =>
          // Dictionary::getSubwords(string): EOS never decomposes
          if (word != Eos)
            subwordIds(word).foreach { g => addRow(acc, g); n += 1 }
      }
      if (n > 0) { var j = 0; while (j < dim) { acc(j) /= n; j += 1 } }
      acc
    }

    /** Bucket-row ids of `<word>`'s char n-grams (offset by nwords). */
    def subwordIds(word: String): Seq[Int] = {
      if (maxn <= 0 || bucket <= 0) return Nil
      val bytes = (Bow + word + Eow).getBytes("UTF-8")
      val out = Seq.newBuilder[Int]
      var i = 0
      while (i < bytes.length) {
        // continuation bytes (10xxxxxx) never start an n-gram
        if ((bytes(i) & 0xC0) != 0x80) {
          var j = i
          var n = 1
          val gram = new java.io.ByteArrayOutputStream()
          while (j < bytes.length && n <= maxn) {
            gram.write(bytes(j)); j += 1
            // absorb continuation bytes of this char
            while (j < bytes.length && (bytes(j) & 0xC0) == 0x80) {
              gram.write(bytes(j)); j += 1
            }
            // fastText pushes when n >= minn, except the full-word
            // 1-char corner (`computeSubwords`' exclusion)
            if (n >= minn && !(n == 1 && (i == 0 || j == bytes.length))) {
              val h = fnv1a32(gram.toByteArray)
              out += nwords + (java.lang.Integer.remainderUnsigned(h, bucket))
            }
            n += 1
          }
        }
        i += 1
      }
      out.result()
    }

    /** The model as an [[Embedder]] (doubles, broadcast-friendly). */
    def toEmbedder: Embedder = new Embedder {
      def dim: Int = Model.this.dim
      def lookup(token: String): Array[Double] = vector(token)
    }

    /** Supervised-line feature ids — fastText `Dictionary::getLine` +
      * `addWordNgrams` exactly: per word token, its subword ids
      * (in-vocab: the word id, plus char n-grams when maxn>0; OOV:
      * char n-grams only — nothing when maxn=0); then word-n-gram
      * bucket ids over the SIGN-EXTENDED uint32 token hashes with the
      * published rolling 116049371 fold in WRAPPING uint64 arithmetic
      * (the int32→uint64 sign extension and the wraparound are part of
      * the on-disk-model contract — a clean-room "fix" would address
      * different buckets than every trained model in the wild). */
    def lineFeatures(tokens: Seq[String]): Seq[Int] = {
      val feats = Seq.newBuilder[Int]
      val hashes = Seq.newBuilder[Int]
      tokens.foreach { tok =>
        if (!tok.startsWith("__label__")) {
          wordIndex.get(tok) match {
            case Some(wid) =>
              if (maxn <= 0) feats += wid
              else {
                feats += wid
                if (tok != Eos) feats ++= subwordIds(tok)
              }
            case None =>
              if (tok != Eos) feats ++= subwordIds(tok) // empty when maxn=0
          }
          hashes += fnv1a32(tok.getBytes("UTF-8"))
        }
      }
      val hs = hashes.result()
      var i = 0
      while (i < hs.size) {
        var h = hs(i).toLong // int32 -> uint64 sign-extension, as C++
        var j = i + 1
        while (j < hs.size && j < i + wordNgrams) {
          h = h * 116049371L + hs(j).toLong // uint64 wraparound == Long
          feats += nwords + java.lang.Long.remainderUnsigned(h, bucket.toLong).toInt
          j += 1
        }
        i += 1
      }
      feats.result()
    }

    /** Top-1 supervised prediction: hidden = mean of the feature rows,
      * logits = output × hidden, argmax (ties → lower label index, the
      * heap-insertion order fastText resolves to). Returns the label
      * and its RAW LOGIT — argmax-equivalent to fastText's
      * log-softmax top-1 (softmax is monotone) but engine-portable:
      * no exp/log whose last ulp differs across libms. None when the
      * line has no known features or the model has no output matrix. */
    def predictArgmax(tokens: Seq[String]): Option[(String, Double)] = {
      if (labels.isEmpty || output.isEmpty) return None
      val feats = lineFeatures(tokens)
      if (feats.isEmpty) return None
      val hidden = new Array[Double](dim)
      feats.foreach { f => addRow(hidden, f) }
      var j = 0
      while (j < dim) { hidden(j) /= feats.size; j += 1 }
      var best = -1
      var bestScore = Double.NegativeInfinity
      var l = 0
      while (l < labels.length) {
        var s = 0.0
        var j2 = 0
        while (j2 < dim) { s += output(l * dim + j2) * hidden(j2); j2 += 1 }
        if (s > bestScore) { bestScore = s; best = l }
        l += 1
      }
      Some((labels(best), bestScore))
    }
  }

  /** `Dictionary::hash`: FNV-1a 32-bit with SIGNED-char fold. */
  def fnv1a32(bytes: Array[Byte]): Int = {
    var h = 2166136261L.toInt
    var i = 0
    while (i < bytes.length) {
      h = h ^ bytes(i).toInt // int8_t sign-extension, as fastText does
      h = h * 16777619
      i += 1
    }
    h
  }

  /** Load a `.bin` from a local/NFS path on the driver. Quantized
    * (`.ftz`) models are rejected — the product-quantized codebook
    * decode is out of scope; export unquantized or use [[VecFormat]]. */
  def load(path: String): Model = {
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val magic = b.getInt()
    require(magic == Magic, s"not a fastText .bin (magic $magic)")
    val version = b.getInt()
    require(version <= 12, s"unsupported fastText version $version")
    val dim = b.getInt()
    b.getInt(); b.getInt(); b.getInt(); b.getInt() // ws epoch minCount neg
    val wordNgrams = b.getInt()
    b.getInt() // loss
    val model = b.getInt() // model_name: cbow=1, sg=2, sup=3
    val bucket = b.getInt()
    val minn = b.getInt()
    // fastText's v11 backward-compat quirk (`FastText::loadModel`):
    // old supervised models never used char n-grams — maxn is forced
    // to 0 regardless of the stored value
    val maxn = if (version == 11 && model == 3) { b.getInt(); 0 } else b.getInt()
    b.getInt() // lrUpdateRate
    b.getDouble() // t
    val size = b.getInt(); val nwords = b.getInt(); b.getInt() // nlabels
    b.getLong() // ntokens
    val pruneidxSize = b.getLong()
    val entries = new Array[(String, Byte)](size)
    var i = 0
    while (i < size) {
      val sb = new java.io.ByteArrayOutputStream()
      var c = b.get()
      while (c != 0) { sb.write(c); c = b.get() }
      val w = new String(sb.toByteArray, "UTF-8")
      b.getLong() // count
      entries(i) = (w, b.get()) // entry type: 0 word, 1 label
      i += 1
    }
    var p = 0L
    while (p < math.max(pruneidxSize, 0L)) { b.getInt(); b.getInt(); p += 1 }
    val quant = b.get()
    require(quant == 0, "quantized (.ftz) fastText models are not supported")
    def denseMatrix(): (Array[Float], Long) = {
      val rows = b.getLong(); val cols = b.getLong()
      require(cols == dim, s"matrix cols $cols != dim $dim")
      require(rows * cols <= Int.MaxValue.toLong,
        s"matrix too large for one array (${rows}x$cols)")
      val m = new Array[Float]((rows * cols).toInt)
      val fb = b.asFloatBuffer(); fb.get(m)
      b.position(b.position() + m.length * 4)
      (m, rows)
    }
    val (m, rows) = denseMatrix()
    // output matrix (label classifier / context vectors) — optional
    // tail for truncated fixtures; real files always carry it
    val (out, outRows) =
      if (b.remaining() > 0) {
        val qout = b.get()
        require(qout == 0, "quantized output matrices are not supported")
        denseMatrix()
      } else (Array.empty[Float], 0L)
    val words = entries.filter(_._2 == 0).map(_._1)
    val labels = entries.filter(_._2 == 1).map(_._1)
    require(words.length == nwords,
      s"dictionary word-type count ${words.length} != nwords $nwords")
    Model(dim, minn, maxn, bucket, wordNgrams, words, labels, m, rows,
      out, outRows)
  }

  /** Write a model in the same binary layout (version 12, unquantized)
    * — the export half of the artifact story: a profile-derived or
    * externally-trained classifier/embedding table round-trips through
    * the public format, so downstream fastText tooling can load it. */
  def write(model: Model, path: String): Unit = {
    val wordBytes = model.words.map(_.getBytes("UTF-8"))
    val labelBytes = model.labels.map(_.getBytes("UTF-8"))
    val dataLen = 128 + wordBytes.map(_.length + 10).sum +
      labelBytes.map(_.length + 10).sum +
      (model.matrix.length + model.output.length) * 4 + 64
    val b = ByteBuffer.allocate(dataLen).order(ByteOrder.LITTLE_ENDIAN)
    b.putInt(Magic).putInt(12)
    b.putInt(model.dim).putInt(5).putInt(5).putInt(1).putInt(5)
    b.putInt(model.wordNgrams)
    b.putInt(1).putInt(if (model.labels.nonEmpty) 3 else 1) // loss, model
    b.putInt(model.bucket).putInt(model.minn).putInt(model.maxn).putInt(100)
    b.putDouble(1e-4)
    val size = model.words.length + model.labels.length
    b.putInt(size).putInt(model.words.length).putInt(model.labels.length)
    b.putLong(0L).putLong(0L) // ntokens, pruneidx
    model.words.foreach { w =>
      b.put(w.getBytes("UTF-8")).put(0.toByte).putLong(1L).put(0.toByte)
    }
    model.labels.foreach { w =>
      b.put(w.getBytes("UTF-8")).put(0.toByte).putLong(1L).put(1.toByte)
    }
    b.put(0.toByte) // quant_input
    b.putLong(model.rows).putLong(model.dim.toLong)
    model.matrix.foreach(b.putFloat)
    if (model.output.nonEmpty) {
      b.put(0.toByte) // qout
      b.putLong(model.outputRows).putLong(model.dim.toLong)
      model.output.foreach(b.putFloat)
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      java.util.Arrays.copyOf(b.array(), b.position()))
  }
}
