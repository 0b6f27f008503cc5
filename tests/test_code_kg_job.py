import pytest


@pytest.fixture()
def code_corpus(spark, tmp_path):
    rows = [
        ("repoA", "a.py", "c" * 40, "python",
         "# Permission is hereby granted, free of charge\n"
         "import numpy\nfrom utilx.core import f\n"),
        ("repoA", "b.py", "c" * 40, "python",
         "import numpy.linalg\nimport utilx\n"),
        ("repoB", "m.go", "c" * 40, "go",
         'package main\nimport "github.com/org/dep"\n'),
        ("repoB", "x.js", "c" * 40, "javascript",
         "const d = require('utilx')\nlet maxRetryCount = 1\n"),
    ]
    src = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    ).write.parquet(src)
    return src


def test_code_kg_job_end_to_end(spark, code_corpus, tmp_path):
    from jobs.code_kg import main

    out = str(tmp_path / "out")
    main(["--input", code_corpus, "--output", out, "--pr-iters", "2"], spark=spark)

    edges = {
        (r.repo, r.path, r.module)
        for r in spark.read.parquet(f"{out}/import_edges").collect()
    }
    assert ("repoA", "a.py", "numpy") in edges
    assert ("repoA", "a.py", "utilx.core") in edges
    assert ("repoB", "m.go", "github.com/org/dep") in edges
    assert ("repoB", "x.js", "utilx") in edges

    roll = {
        (r.repo, r.root): (r.n_files, r.n_imports)
        for r in spark.read.parquet(f"{out}/module_rollup").collect()
    }
    assert roll[("repoA", "numpy")] == (2, 2)
    assert roll[("repoA", "utilx")] == (2, 2)
    assert roll[("repoB", "utilx")] == (1, 1)

    pr = spark.read.parquet(f"{out}/module_pagerank")
    assert pr.count() > 0
    # utilx is imported by both repos -> highest-ranked dependency root
    ranks = {r.node: r.rank for r in pr.collect()}
    dep_ranks = {k: v for k, v in ranks.items() if k not in ("repoA", "repoB")}
    assert max(dep_ranks, key=dep_ranks.get) == "utilx"

    vocab = {r.token: r.n for r in spark.read.parquet(f"{out}/identifier_vocab").collect()}
    assert vocab["import"] >= 3 and "retry" in vocab and "max" in vocab

    lic = {
        (r.repo, r.license): (r.n_files, r.n_dependency_roots)
        for r in spark.read.parquet(f"{out}/licenses").collect()
    }
    assert lic[("repoA", "MIT")] == (1, 2)  # 2 roots: numpy + utilx
    assert lic[("repoA", "unknown")] == (1, 2)

    summ = spark.read.parquet(f"{out}/summary").collect()[0]
    assert summ.n_files == 4 and summ.n_repos == 2
    assert summ.n_import_edges == 6 and summ.n_modules == 5
