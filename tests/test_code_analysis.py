from phenobert_spark.operators.code_analysis import (
    extract_import_edges,
    identifier_subtokens,
    identifier_vocab,
    import_rollup,
)

from pyspark.sql import functions as F

PY = """\
import os
import numpy.linalg
from collections import OrderedDict
  from pkg.sub import thing
x = 1  # import not_a_real_import (mid-line comment)
print("import fake")
"""

JS = """\
const fs = require('fs')
import {x} from './local/mod'
import Default from "pkg"
// require('commented')  <- still matches: require() anywhere is a dep
let y = 2
"""

JAVA = """\
package com.example;
import java.util.List;
import static org.junit.Assert.assertTrue;
class A {}
"""

GO = """\
package main
import "fmt"
import "github.com/org/dep"
func main() {}
"""


def _edges(spark, rows):
    df = spark.createDataFrame(
        rows, "repo string, path string, lang string, content string"
    )
    return {
        (r.path, r.module)
        for r in extract_import_edges(df).collect()
    }


def test_python_imports(spark):
    got = _edges(spark, [("r", "a.py", "python", PY)])
    assert got == {
        ("a.py", "os"),
        ("a.py", "numpy.linalg"),
        ("a.py", "collections"),
        ("a.py", "pkg.sub"),
    }


def test_js_imports_incl_require_anywhere(spark):
    got = _edges(spark, [("r", "a.js", "javascript", JS)])
    assert got == {
        ("a.js", "fs"),
        ("a.js", "./local/mod"),
        ("a.js", "pkg"),
        ("a.js", "commented"),
    }


def test_java_and_go_and_unknown_lang(spark):
    got = _edges(
        spark,
        [
            ("r", "A.java", "java", JAVA),
            ("r", "m.go", "go", GO),
            ("r", "x.rb", "ruby", "require 'x'"),
        ],
    )
    assert got == {
        ("A.java", "java.util.List"),
        ("A.java", "org.junit.Assert.assertTrue"),
        ("m.go", "fmt"),
        ("m.go", "github.com/org/dep"),
    }


def test_typescript_alias_and_distinct(spark):
    # the same import twice in one file -> one edge
    ts = "import a from 'x'\nimport b from 'x'\n"
    got = _edges(spark, [("r", "a.ts", "typescript", ts)])
    assert got == {("a.ts", "x")}


def test_import_rollup_roots(spark):
    df = spark.createDataFrame(
        [
            ("r1", "a.py", "python", "import numpy.linalg\nimport numpy\n"),
            ("r1", "b.py", "python", "import numpy\n"),
            ("r1", "m.go", "go", 'import "github.com/org/dep"\n'),
        ],
        "repo string, path string, lang string, content string",
    )
    roll = {
        (r.repo, r.root): (r.n_files, r.n_imports)
        for r in import_rollup(extract_import_edges(df)).collect()
    }
    assert roll[("r1", "numpy")] == (2, 3)
    assert roll[("r1", "github")] == (1, 1)


def test_identifier_subtokens_shapes(spark):
    df = spark.createDataFrame(
        [("getValue3 parse_json_2 HTTPServer maxRetryCount X y _private",)],
        "content string",
    )
    toks = df.select(
        F.explode(identifier_subtokens(F.col("content"))).alias("t")
    )
    got = sorted(r.t for r in toks.collect())
    assert got == sorted(
        [
            "get", "value3",
            "parse", "json",          # the pure-digit '2' is dropped
            "http", "server",         # acronym-run split
            "max", "retry", "count",
            "x", "y", "private",
        ]
    )


def test_identifier_vocab_counts(spark):
    df = spark.createDataFrame(
        [("getX getY",), ("get_z getX",)], "content string"
    )
    counts = {r.token: r.n for r in identifier_vocab(df).collect()}
    assert counts["get"] == 4
    assert counts["x"] == 2 and counts["y"] == 1 and counts["z"] == 1


def test_path_stats(spark):
    from phenobert_spark.operators.code_analysis import path_stats

    df = spark.createDataFrame(
        [
            ("r1", "src/main.py"),
            ("r1", "src/util/helpers.py"),
            ("r1", "README"),
            ("r1", "a/b/c/d.TXT"),
            ("r2", "x.js"),
        ],
        "repo string, path string",
    )
    got = {
        (r.repo, r.ext): (r.n_files, r.avg_depth, r.max_depth)
        for r in path_stats(df).collect()
    }
    assert got[("r1", "py")] == (2, 1.5, 2)
    assert got[("r1", "")] == (1, 0.0, 0)
    assert got[("r1", "txt")] == (1, 3.0, 3)
    assert got[("r2", "js")] == (1, 0.0, 0)


def test_repo_fork_candidates(spark):
    from phenobert_spark.operators.code_analysis import repo_fork_candidates

    rows = (
        [("r1", f"src/f{i}.py") for i in range(4)]
        + [("r2", f"src/f{i}.py") for i in range(4)]    # exact fork of r1
        + [("r2", "src/f0.py")]                          # dup row: ignored
        + [("r3", f"src/f{i}.py") for i in range(2)]     # half overlap
        + [("r3", "other/a.py"), ("r3", "other/b.py")]
        + [("r4", "unrelated/x.py")]
    )
    df = spark.createDataFrame(rows, "repo string, path string")
    got = {
        (r.repo_a, r.repo_b): (r.n_common, r.n_a, r.n_b, r.jaccard)
        for r in repo_fork_candidates(df, threshold=0.3).collect()
    }
    assert got[("r1", "r2")] == (4, 4, 4, 1.0)
    assert got[("r1", "r3")] == (2, 4, 4, round(2 / 6, 6))
    assert got[("r2", "r3")] == (2, 4, 4, round(2 / 6, 6))
    assert not any("r4" in k for k in got)


def test_repo_fork_candidates_boilerplate_cut(spark):
    from phenobert_spark.operators.code_analysis import repo_fork_candidates

    # README in every repo; without the df cut r1/r2 would pair
    rows = [(f"r{i}", "README.md") for i in range(5)] + [
        ("r1", "a.py"), ("r2", "b.py")
    ]
    df = spark.createDataFrame(rows, "repo string, path string")
    with_cut = repo_fork_candidates(
        df, threshold=0.1, max_path_df=3
    ).collect()
    assert with_cut == []
    no_cut = repo_fork_candidates(df, threshold=0.1).collect()
    assert len(no_cut) == 10  # all C(5,2) pairs via the hot path
