#!/usr/bin/env python
"""Compile the Catalyst-injection shim (skinner.SkinnerReorderRule) against
the installed pyspark's jars and package it at
skinnerdb_spark/jars/skinner-rule.jar (the path session.py puts on the
driver classpath). Requires javac (JDK 17 is fine); idempotent.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile


def main() -> int:
    if shutil.which("javac") is None:
        print("javac not found; keeping the committed jar")
        return 0
    import pyspark

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(
        repo, "skinnerdb_spark", "plans", "java", "skinner", "SkinnerReorderRule.java"
    )
    out_jar = os.path.join(repo, "skinnerdb_spark", "jars", "skinner-rule.jar")
    spark_jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    with tempfile.TemporaryDirectory() as tmp:
        subprocess.run(
            ["javac", "-classpath", os.path.join(spark_jars, "*"), "-d", tmp, src],
            check=True,
        )
        os.makedirs(os.path.dirname(out_jar), exist_ok=True)
        subprocess.run(["jar", "cf", out_jar, "-C", tmp, "skinner"], check=True)
    print(f"built {out_jar}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
