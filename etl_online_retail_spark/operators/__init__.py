"""Composable DataFrame -> DataFrame operators (SURVEY.md §2).

Each module covers one band of the reference's operator inventory plus the
scale extensions; everything returns lazy DataFrames so Catalyst fuses the
whole pipeline into as few stages as the plan allows.

    cleaning     P1-P5 projections/casts, F1-F3 row filters (etl.py:43-89)
    joins        J1-J3 broadcast star joins (etl.py:216-225; superset)
    aggregates   A1-A5 aggs, F7 HAVING, O1-O3 sort/limit/top-k, T1 grains
    windows      ranking/frame windows (SURVEY.md §2.6) + top-n per group
    surrogate    SERIAL surrogate keys + unknown-member seeding (init_db.sql)
    dedup        keep-last SCD1 + exact/minhash/simhash/jaccard/embedding dedup
    similarity   brute-force + LSH-bucketed cosine nearest neighbours
    sessionize   gap-based event sessionization (events table)
"""
