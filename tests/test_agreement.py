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
