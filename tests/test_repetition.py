"""Repetition-signal functions vs an independent pure-Python reference:
the Spark side computes the top-bigram share with a run-length max over
a sorted array inside one aggregate — this cross-checks that trick
against the obvious Counter formulation on adversarial inputs."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from ocr_spark.functions.text import dup_line_frac, top_bigram_frac

CASES = [
    "",
    " ",
    "   ",
    "a",
    "a a",
    "a a a a a a",
    "x y x y x y",
    "one two three four five",
    "a\nb\na\nb\nc",
    "same\nsame\nsame",
    "多 字 多 字 多",
    "\ttab-led words tab stays",  # Spark trim strips spaces only
    "\nnewline-led words here",
    "w " * 500,
    "alpha beta " * 100 + "gamma",
]


def _py_tokens(s: str) -> list[str]:
    # mirror F.split(F.trim(c), r"\s+") exactly: trim strips SPACES
    # only, and splitting a leading separator yields an empty token
    return re.split(r"\s+", s.strip(" "))


def _py_top_bigram_frac(s: str) -> float:
    w = _py_tokens(s)
    bgs = [f"{a} {b}" for a, b in zip(w, w[1:])]
    if not bgs:
        return 0.0
    return max(Counter(bgs).values()) / len(bgs)


def _py_dup_line_frac(s: str) -> float:
    lines = s.split("\n")
    return 1.0 - len(set(lines)) / len(lines)


def test_repetition_functions_match_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], "i int, text string")
    got = {
        r["i"]: (r["d"], r["b"])
        for r in df.select(
            "i",
            dup_line_frac(F.col("text")).alias("d"),
            top_bigram_frac(F.col("text")).alias("b"),
        ).collect()
    }
    for i, t in enumerate(CASES):
        d, b = got[i]
        # Spark rounds to 6 decimals; the unrounded reference may sit
        # up to 5e-7 away
        assert abs(d - _py_dup_line_frac(t)) < 5.1e-7, (i, t[:40], d)
        assert abs(b - _py_top_bigram_frac(t)) < 5.1e-7, (i, t[:40], b)
