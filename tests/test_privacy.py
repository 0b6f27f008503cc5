import pytest

from phenobert_spark.operators.privacy import (
    k_anonymity_groups,
    k_anonymity_summary,
    l_diversity_groups,
)


def _df(spark):
    rows = [
        # (zip, age_band, disease)
        ("111", "20-29", "flu"),
        ("111", "20-29", "cold"),
        ("111", "20-29", "flu"),
        ("222", "30-39", "flu"),      # singleton QI group
        ("333", "40-49", "asthma"),   # k=2 group, but homogeneous
        ("333", "40-49", "asthma"),
    ]
    return spark.createDataFrame(rows, "zip string, age string, disease string")


def test_k_anonymity_groups_and_summary(spark):
    df = _df(spark)
    g = {
        (r.zip, r.age): (r.n, r.is_anonymous)
        for r in k_anonymity_groups(df, ["zip", "age"], k=2).collect()
    }
    assert g[("111", "20-29")] == (3, True)
    assert g[("222", "30-39")] == (1, False)
    assert g[("333", "40-49")] == (2, True)

    s = k_anonymity_summary(df, ["zip", "age"], k=2).collect()[0]
    assert (s.n_rows, s.n_groups, s.n_violating_groups) == (6, 3, 1)
    assert s.n_rows_at_risk == 1 and s.min_group_size == 1
    assert s.passes is False

    s3 = k_anonymity_summary(df, ["zip", "age"], k=4).collect()[0]
    assert s3.n_violating_groups == 3 and s3.passes is False


def test_l_diversity_homogeneity_attack(spark):
    df = _df(spark)
    g = {
        (r.zip, r.age): (r.n_distinct_sensitive, r.is_diverse)
        for r in l_diversity_groups(df, ["zip", "age"], "disease").collect()
    }
    assert g[("111", "20-29")] == (2, True)
    # k-anonymous at k=2 but leaks the diagnosis
    assert g[("333", "40-49")] == (1, False)


def test_privacy_arg_validation(spark):
    df = _df(spark)
    with pytest.raises(ValueError):
        k_anonymity_groups(df, [], k=2)
    with pytest.raises(ValueError):
        k_anonymity_summary(df, ["zip"], k=1)
    with pytest.raises(ValueError):
        l_diversity_groups(df, ["zip"], "disease", l_threshold=1)
