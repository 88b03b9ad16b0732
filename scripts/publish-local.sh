#!/usr/bin/env bash
# Prove the library publishes as a consumable artifact: sbt publishLocal
# into the local ivy repository, then verify the jar + ivy descriptor
# landed and print their coordinates. Exercised once per round (the
# library version story — SURVEY §7.17).
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch publishLocal
VER=$(grep -oP 'ThisBuild / version := "\K[^"]+' build.sbt)
ART="$HOME/.ivy2/local/impalarefresherspark/impalarefresherspark_2.13/$VER"
for f in "$ART/jars/impalarefresherspark_2.13.jar" "$ART/ivys/ivy.xml"; do
  if [ ! -f "$f" ]; then
    echo "publishLocal artifact missing: $f" >&2
    exit 1
  fi
done
echo "published: impalarefresherspark_2.13 $VER"
ls -l "$ART/jars" "$ART/ivys"
