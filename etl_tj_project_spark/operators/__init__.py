"""Relational + data-pipeline operators (the engine's operator inventory).

projections.py  typed cleaning views (S3/P1, UD1/UD2 application)
dims.py         CSV staging → typed dimension promotion (S5/S6, F7-F12)
aggregates.py   the three daily aggregates + joins (A1-A3, J1-J4, U1-U2)
dedup.py        exact / MinHash-LSH / SimHash / n-gram-Jaccard dedup
similarity.py   brute-force + LSH-bucketed ANN over embeddings
multimodal.py   opaque-binary column plumbing (decode stubs, real plumbing)
"""
