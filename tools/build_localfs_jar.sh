#!/bin/bash
# Rebuild swarm_spark/jars/swarm-localfs.jar from swarm_spark/javaext.
# Needs a JDK and the pyspark-bundled hadoop-client-api jar.
set -euo pipefail
cd "$(dirname "$0")/.."
HADOOP_JAR=$(python -c "import pyspark, glob, os; print(glob.glob(os.path.join(os.path.dirname(pyspark.__file__), 'jars', 'hadoop-client-api-*.jar'))[0])")
OUT=swarm_spark/jars/swarm-localfs.jar
BUILD=$(mktemp -d)
javac -encoding UTF-8 -cp "$HADOOP_JAR" -d "$BUILD" swarm_spark/javaext/swarmspark/fs/*.java
jar cf "$OUT" -C "$BUILD" swarmspark
rm -rf "$BUILD"
echo "built $OUT"
