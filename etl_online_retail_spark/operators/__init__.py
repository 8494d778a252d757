"""Composable DataFrame -> DataFrame operators (SURVEY.md §2).

Each module covers one band of the reference's operator inventory plus the
scale extensions; everything returns lazy DataFrames so Catalyst fuses the
whole pipeline into as few stages as the plan allows.

    cleaning     P1-P5 projections/casts, F1-F3 row filters (etl.py:43-89)
    joins        J1-J3 broadcast star joins (etl.py:216-225; superset)
    aggregates   A1-A5 aggs, F7 HAVING, O1-O3 sort/limit/top-k, T1 grains
    windows      ranking/frame windows (SURVEY.md §2.6) + top-n per group
    surrogate    SERIAL surrogate keys + unknown-member seeding (init_db.sql)
    dedup        keep-last SCD1 + exact/minhash/simhash/jaccard/embedding
                 dedup + the LSH calibration scorecard
    similarity   brute-force/LSH/IVF/PQ nearest neighbours + PCA
    sessionize   gap sessionization + last-touch/linear attribution
    spans        cross-document duplicate-span detection + excision
    privacy      k-anonymity/l-diversity gating + erasure propagation
    planner      statistics-driven join strategy choice (sketch-backed)
    graph        BFS, PageRank (+personalized), triangles, PMI/rules
    timeseries   gap-fill/streaks/TWA/EWMA/Holt + rolling z-score gate
    profile      one-scan profiling, constraint suggestion, PSI drift,
                 key-skew diagnostics, observe-while-writing metrics
    constraints  load-time integrity checks + quarantine split
    curation     corpus pipeline, splits, rank norm, contrastive pairs
    sampling     deterministic samples, token-budget mixes
    sketches     CMS/Bloom/KMV/HDR + join-size estimation
    aggregates   (+ MAD outliers, jackknife CIs)
    ivm          incremental JOIN-view maintenance (delta algebra)
    packing/bpe/relevance/linkage/scd/layout/matview/quantize  (see files)
"""
