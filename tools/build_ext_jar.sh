#!/bin/sh
# Build deeplake-spark-ext.jar (the SparkSessionExtensions index-routing
# rule) against the installed pyspark's jars. Java 17 only — no Scala
# compiler needed (the rule extends Catalyst's Scala classes from Java).
# The compiled jar is committed at deeplake_spark/plans/jvm/ so users
# don't need a JDK; run this after editing the sources.
set -e
cd "$(dirname "$0")/.."
SPARK_JARS=$(python -c "import pyspark, os; print(os.path.join(os.path.dirname(pyspark.__file__), 'jars'))")
SRC=deeplake_spark/plans/jvm/src
OUT=$(mktemp -d)
javac -encoding UTF-8 -proc:none -classpath "$SPARK_JARS/*" -d "$OUT" \
    "$SRC"/io/deeplake/spark/ext/*.java
jar cf deeplake_spark/plans/jvm/deeplake-spark-ext.jar -C "$OUT" io
rm -rf "$OUT"
echo "built deeplake_spark/plans/jvm/deeplake-spark-ext.jar"
