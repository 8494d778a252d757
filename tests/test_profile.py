"""pearson_exact: exact-sum Pearson correlation (profiling /
reward length-bias audits)."""


def test_pearson_exact_hand_values(spark):
    """Perfect line r=1; anti-line r=-1; constant column NULL; NULL
    rows pairwise-deleted; exact sums verified."""
    from etl_online_retail_spark.operators.profile import pearson_exact

    rows = [("up", 1, 10), ("up", 2, 20), ("up", 3, 30),
            ("dn", 1, 3), ("dn", 2, 2), ("dn", 3, 1),
            ("flat", 5, 1), ("flat", 5, 2),
            ("nulls", 1, 1), ("nulls", 2, 2), ("nulls", None, 9)]
    df = spark.createDataFrame(rows, "g string, x long, y long")
    got = {r.g: r for r in
           pearson_exact(df, "x", "y", group_col="g").collect()}
    up = got["up"]
    assert (up.n, up.sx, up.sy, up.sxy, up.sxx, up.syy) == \
        (3, 6, 60, 140, 14, 1400)

    def ref_r(n, sx, sy, sxy, sxx, syy):
        # the operator's exact IEEE tree (r may pass 1.0 by an ulp:
        # sqrt(vx)*sqrt(vy) is two roundings of sqrt(vx*vy))
        return ((n * sxy - sx * sy)
                / ((n * sxx - sx * sx) ** 0.5
                   * (n * syy - sy * sy) ** 0.5))

    assert up.r == ref_r(3, 6, 60, 140, 14, 1400)
    assert abs(up.r - 1.0) < 1e-12
    assert abs(got["dn"].r + 1.0) < 1e-12
    assert got["flat"].r is None          # zero x-variance
    assert got["nulls"].n == 2 and got["nulls"].r == 1.0
