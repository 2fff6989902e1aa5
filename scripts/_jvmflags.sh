# Shared JVM invocation pieces for scripts/bench.sh and
# scripts/verify.sh — source this, then use $ADD_OPENS and $JVM_FLAGS.
# Mirrors build.sbt's forked-run javaOptions (Spark 4.x on JDK 17
# needs the add-opens that spark-submit would normally inject).
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# --add-modules: Panama Vector API for the SIMD covariance kernel
# (graft.text.SimdTriangle); absent the flag, the bit-identical scalar
# kernel runs — same answers, lower throughput.
JVM_FLAGS="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  --add-modules=jdk.incubator.vector \
  -Xmx${SPARK_DRIVER_MEM:-24g} -XX:ReservedCodeCacheSize=2g"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
