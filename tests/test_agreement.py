"""Inter-annotator agreement: the textbook kappa example, NULL-as-
label consistency, grouped kappa, degenerate-denominator NULL."""

from etl_online_retail_spark.operators.agreement import (
    cohens_kappa,
    confusion_matrix,
)


def _labels(spark, rows, with_group=False):
    schema = ("src string, label_a string, label_b string" if with_group
              else "label_a string, label_b string")
    return spark.createDataFrame(rows, schema)


def test_cohens_kappa_textbook_two_by_two(spark):
    """Classic 2x2: 20 yes/yes, 15 no/no, 10 yes/no, 5 no/yes over
    n=50 -> po=0.7, pe=0.5, kappa=0.4 exactly (integer identity:
    (50*35 - 1250) / (2500 - 1250))."""
    rows = ([("y", "y")] * 20 + [("n", "n")] * 15
            + [("y", "n")] * 10 + [("n", "y")] * 5)
    r = cohens_kappa(_labels(spark, rows)).collect()[0]
    assert (r.n, r.n_agree, r.pe_num) == (50, 35, 30 * 25 + 20 * 25)
    assert r.kappa == 0.4


def test_confusion_matrix_counts(spark):
    rows = [("y", "y"), ("y", "n"), ("y", "n"), (None, "n")]
    got = {(r.label_a, r.label_b): r.n
           for r in confusion_matrix(_labels(spark, rows)).collect()}
    assert got == {("y", "y"): 1, ("y", "n"): 2, (None, "n"): 1}


def test_null_is_a_label_on_both_sides(spark):
    """NULL-NULL counts as agreement AND the NULL bucket enters the
    marginal product — po and pe range over the same label space."""
    rows = [(None, None), (None, None), ("y", "y"), ("y", None)]
    r = cohens_kappa(_labels(spark, rows)).collect()[0]
    # marginals: a: NULL=2, y=2; b: NULL=3, y=1 -> pe_num = 6 + 2
    assert (r.n, r.n_agree, r.pe_num) == (4, 3, 8)
    assert r.kappa == (4 * 3 - 8) / (16 - 8)


def test_kappa_grouped_and_degenerate(spark):
    """Per-group kappas are independent; a group where both
    annotators are constant-and-identical has pe = 1 -> NULL kappa."""
    rows = ([("g1", "y", "y")] * 2 + [("g1", "y", "n")] * 2
            + [("g1", "n", "y")] * 2 + [("g1", "n", "n")] * 2
            + [("g2", "y", "y")] * 3)
    got = {r.src: r for r in
           cohens_kappa(_labels(spark, rows, True),
                        group_col="src").collect()}
    g1 = got["g1"]           # po = pe = 0.5 -> kappa 0
    assert (g1.n, g1.n_agree, g1.pe_num) == (8, 4, 4 * 4 + 4 * 4)
    assert g1.kappa == 0.0
    assert got["g2"].kappa is None


def test_fleiss_kappa_zero_and_identity(spark):
    """3 items x 3 raters where observed agreement exactly equals
    chance: A=10, D1=18, B=45, (Nn)^2=81 -> po = pe = 5/9, kappa = 0.
    A 2-rating item is dropped and counted, never entering A/B."""
    from etl_online_retail_spark.operators.agreement import fleiss_kappa

    rows = [(1, "a"), (1, "a"), (1, "a"),
            (2, "a"), (2, "a"), (2, "b"),
            (3, "b"), (3, "b"), (3, "a"),
            (4, "a"), (4, "a")]            # ragged -> dropped
    df = spark.createDataFrame(rows, "item_id long, label string")
    r = fleiss_kappa(df, n_raters=3).collect()[0]
    assert (r.n_items, r.n_dropped, r.a_num, r.b_num) == (3, 1, 10, 45)
    assert r.po == 10 / 18 and r.pe == 45 / 9 / 9
    assert r.kappa == 0.0


def test_fleiss_kappa_perfect_and_grouped(spark):
    """Per-group: g1 has unanimous raters on every item (po = 1,
    kappa = 1); g2 is all-items-one-label (pe = 1 -> NULL kappa)."""
    from etl_online_retail_spark.operators.agreement import fleiss_kappa

    rows = ([("g1", 1, "a")] * 2 + [("g1", 2, "b")] * 2
            + [("g2", 1, "x")] * 2 + [("g2", 2, "x")] * 2)
    df = spark.createDataFrame(rows, "src string, item_id long, label string")
    got = {r.src: r for r in
           fleiss_kappa(df, n_raters=2, group_col="src").collect()}
    assert got["g1"].po == 1.0 and got["g1"].kappa == 1.0
    assert got["g2"].pe == 1.0 and got["g2"].kappa is None


def test_fleiss_kappa_rejects_single_rater(spark):
    import pytest

    from etl_online_retail_spark.operators.agreement import fleiss_kappa

    df = spark.createDataFrame([(1, "a")], "item_id long, label string")
    with pytest.raises(ValueError):
        fleiss_kappa(df, n_raters=1)


def test_kappa_disjoint_marginals_group_survives(spark):
    """Annotators with fully disjoint label sets share no marginal
    product: the group must report pe_num = 0, kappa = po, not vanish
    (review r13)."""
    rows = [("d", "x", "y"), ("d", "x", "y"), ("ok", "y", "y")]
    got = {r.src: r for r in
           cohens_kappa(_labels(spark, rows, True),
                        group_col="src").collect()}
    d = got["d"]
    assert (d.n, d.n_agree, d.pe_num) == (2, 0, 0)
    assert d.kappa == 0.0                 # (2*0 - 0) / (4 - 0)
    assert got["ok"].kappa is None        # degenerate pe = 1


def test_fleiss_all_ragged_group_still_reported(spark):
    """A group in which EVERY item is ragged keeps its row:
    (n_items=0, n_dropped=K, NULL po/pe/kappa) — dropped means
    counted, not lost (review r13)."""
    from etl_online_retail_spark.operators.agreement import fleiss_kappa

    rows = ([("good", 1, "a")] * 3 + [("good", 2, "b")] * 3
            + [("bad", 1, "a")] * 2 + [("bad", 2, "b")])
    df = spark.createDataFrame(
        rows, "src string, item_id long, label string")
    got = {r.src: r for r in
           fleiss_kappa(df, n_raters=3, group_col="src").collect()}
    bad = got["bad"]
    assert (bad.n_items, bad.n_dropped, bad.a_num, bad.b_num) == \
        (0, 2, 0, 0)
    assert bad.po is None and bad.pe is None and bad.kappa is None
    good = got["good"]
    assert (good.n_items, good.n_dropped) == (2, 0)
    assert good.po == 1.0


def test_krippendorff_alpha_hand_values(spark):
    """u1(a,a) u2(a,b) u3(b,b) u4(b,b,b) + a single-rating item:
    S_2=4, S_3=6, n=9 -> A_o=7/9; n_a=3, n_b=6 -> A_e=36/72=0.5;
    alpha = (7/9 - 1/2)/(1/2). The dropped item is counted."""
    from etl_online_retail_spark.operators.agreement import (
        krippendorff_alpha,
    )

    rows = [(1, "a"), (1, "a"), (2, "a"), (2, "b"),
            (3, "b"), (3, "b"), (4, "b"), (4, "b"), (4, "b"),
            (5, "a")]
    df = spark.createDataFrame(rows, "item_id long, label string")
    r = krippendorff_alpha(df).collect()[0]
    assert (r.n_ratings, r.n_items, r.n_dropped) == (9, 4, 1)
    assert r.ao == (4.0 / 1 + 6.0 / 2) / 9
    assert r.ae == 36.0 / 9 / 8
    assert r.alpha == (r.ao - r.ae) / (1.0 - r.ae)


def test_krippendorff_alpha_all_singletons_group_reported(spark):
    """A group with ONLY single-rating items keeps its row with NULL
    alpha (nothing pairable), per the fleiss review lesson."""
    from etl_online_retail_spark.operators.agreement import (
        krippendorff_alpha,
    )

    rows = [("g1", 1, "a"), ("g1", 1, "a"),
            ("g2", 1, "a"), ("g2", 2, "b")]
    df = spark.createDataFrame(
        rows, "src string, item_id long, label string")
    got = {r.src: r for r in
           krippendorff_alpha(df, group_col="src").collect()}
    g2 = got["g2"]
    assert (g2.n_ratings, g2.n_items, g2.n_dropped) == (0, 0, 2)
    assert g2.alpha is None
    g1 = got["g1"]                        # unanimous pair: ao = 1
    assert g1.ao == 1.0 and g1.alpha is None   # ae = 1 -> undefined


def test_null_group_keeps_chance_correction(spark):
    """A NULL group value must keep its marginal products: with plain
    equality on the group key the pe join drops the NULL group and
    kappa silently becomes po (r13 advice). All group-grain joins are
    eqNullSafe now — the NULL group's kappa must equal the same data's
    ungrouped kappa."""
    rows = [(None, "y", "y")] * 20 + [(None, "n", "n")] * 15 \
        + [(None, "y", "n")] * 10 + [(None, "n", "y")] * 5
    r = cohens_kappa(_labels(spark, rows, True),
                     group_col="src").collect()[0]
    assert r.src is None
    assert (r.n, r.n_agree, r.pe_num) == (50, 35, 30 * 25 + 20 * 25)
    assert r.kappa == 0.4                 # NOT po = 0.7

    from etl_online_retail_spark.operators.agreement import (
        fleiss_kappa,
        krippendorff_alpha,
    )

    frows = [(None, 1, "a")] * 3 + [(None, 2, "b")] * 3
    fdf = spark.createDataFrame(
        frows, "src string, item_id long, label string")
    fr = fleiss_kappa(fdf, n_raters=3, group_col="src").collect()[0]
    assert fr.src is None
    assert (fr.n_items, fr.b_num) == (2, 18)   # b_num survives the join
    assert fr.po == 1.0

    arows = [(None, 1, "a"), (None, 1, "a"), (None, 2, "a"),
             (None, 2, "b")]
    adf = spark.createDataFrame(
        arows, "src string, item_id long, label string")
    ar = krippendorff_alpha(adf, group_col="src").collect()[0]
    assert ar.src is None
    assert (ar.n_ratings, ar.n_items) == (4, 2)  # ne survives the join
    assert ar.ao == (2.0 / 1) / 4


def test_agreement_pins_no_cache_entries(spark):
    """Repeated fleiss/alpha/kappa calls must not grow the cache
    manager: the r13 shape cached the first aggregation with no
    unpersist path, pinning one dead relation per call for the session
    (r13 verdict item 2). The r14 shape materializes with an eager
    localCheckpoint instead — blocks are released with the RDD by the
    context cleaner, and NOTHING registers in the cache manager."""
    from etl_online_retail_spark.operators.agreement import (
        fleiss_kappa,
        krippendorff_alpha,
    )

    cm = spark._jsparkSession.sharedState().cacheManager()

    def n_cached() -> int:
        # entry COUNT, not isEmpty: a session fixture may already have
        # cached a relation, in which case isEmpty stays False however
        # many entries the operators pin (r14 ADVICE) — net growth is
        # the regression signal that works on a dirty cache too
        try:
            return cm.cachedData().size()
        except Exception:  # accessor moved: fall back to the weak check
            return 0 if cm.isEmpty() else 1

    before = n_cached()
    rows = [("g", i % 7, f"L{i % 3}") for i in range(60)]
    df = spark.createDataFrame(
        rows, "src string, item_id long, label string")
    for _ in range(3):
        fleiss_kappa(df, n_raters=3, group_col="src").collect()
        krippendorff_alpha(df, group_col="src").collect()
        cohens_kappa(_labels(spark, [("a", "b"), ("a", "a")])).collect()
    # no NET growth: whatever was cached before (session fixtures) is
    # unchanged, and nothing new registered
    assert n_cached() == before
