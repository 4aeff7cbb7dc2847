"""Explicit StructTypes for every table the engine touches.

The reference declares all schemas as DDL (staging tables all-text, typed
finals; SURVEY §1.2) — we mirror that with explicit ``StructType``s and a
deliberate text-staging → typed-promotion step. ``inferSchema`` is never
used on correctness-critical loads.

Reference DDL parity (file:line cites into /root/reference):
* routes / shelter_corridor / realisasi_bus finals:
  dags/stage_csv_dims_to_pg.py:53-77
* staging (all-text):            dags/stage_csv_dims_to_pg.py:81-98
* typed transaction views:       dags/dag_datapelangan.py:68-86
* aggregate tables:              dags/dag_datapelangan.py:118-140
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Reference-domain: raw CSV staging schemas (every column a string — the
# reference COPYs CSVs into all-text staging tables first).
# --------------------------------------------------------------------------

def _all_strings(*names: str) -> T.StructType:
    return T.StructType([T.StructField(n, T.StringType(), True) for n in names])


TRANSAKSI_COLUMNS_COMMON = [
    "uuid",
    "waktu_transaksi",
    "card_number_var",
    "card_type_var",
    "balance_before_int",
    "fare_int",
    "balance_after_int",
    "transcode_txt",
    "gate_in_boo",
    "p_latitude_flo",
    "p_longitude_flo",
    "status_var",
    "free_service_boo",
    "insert_on_dtm",
]

TRANSAKSI_BUS_RAW = _all_strings(
    "uuid", "waktu_transaksi", "armada_id_var", "no_body_var",
    "card_number_var", "card_type_var", "balance_before_int", "fare_int",
    "balance_after_int", "transcode_txt", "gate_in_boo", "p_latitude_flo",
    "p_longitude_flo", "status_var", "free_service_boo", "insert_on_dtm",
)

TRANSAKSI_HALTE_RAW = _all_strings(
    "uuid", "waktu_transaksi", "shelter_name_var", "terminal_name_var",
    "card_number_var", "card_type_var", "balance_before_int", "fare_int",
    "balance_after_int", "transcode_txt", "gate_in_boo", "p_latitude_flo",
    "p_longitude_flo", "status_var", "free_service_boo", "insert_on_dtm",
)

ROUTES_STAGING = _all_strings("route_code", "route_name")
SHELTER_CORRIDOR_STAGING = _all_strings(
    "shelter_name_var", "corridor_code", "corridor_name"
)
REALISASI_BUS_STAGING = _all_strings(
    "tanggal_realisasi", "bus_body_no", "rute_realisasi"
)

# --------------------------------------------------------------------------
# Reference-domain: typed finals (post-promotion).
# --------------------------------------------------------------------------

ROUTES = T.StructType([
    T.StructField("route_code", T.StringType(), False),   # PK in reference
    T.StructField("route_name", T.StringType(), True),
])

SHELTER_CORRIDOR = T.StructType([
    T.StructField("shelter_name_var", T.StringType(), False),  # PK
    T.StructField("corridor_code", T.IntegerType(), True),
    T.StructField("corridor_name", T.StringType(), True),
])

REALISASI_BUS = T.StructType([
    T.StructField("tanggal_realisasi", T.DateType(), True),
    T.StructField("bus_body_no_norm", T.StringType(), True),
    T.StructField("rute_realisasi", T.StringType(), True),
])

# Typed transaction view schemas (src.vw_trx_bus_raw / vw_trx_halte_raw).
AMOUNT = T.DecimalType(18, 2)

VW_TRX_BUS = T.StructType([
    T.StructField("tanggal", T.DateType(), True),
    T.StructField("card_type", T.StringType(), True),
    T.StructField("amount", AMOUNT, True),
    T.StructField("status_var", T.StringType(), True),
    T.StructField("no_body_norm", T.StringType(), True),
    T.StructField("gate_in_boo", T.BooleanType(), True),
])

VW_TRX_HALTE = T.StructType([
    T.StructField("tanggal", T.DateType(), True),
    T.StructField("card_type", T.StringType(), True),
    T.StructField("amount", AMOUNT, True),
    T.StructField("status_var", T.StringType(), True),
    T.StructField("shelter_name_var", T.StringType(), True),
    T.StructField("gate_in_boo", T.BooleanType(), True),
])

# Aggregate sink schemas (dw.agg_by_card / agg_by_route / agg_by_tariff).
AGG_BY_CARD = T.StructType([
    T.StructField("tanggal", T.DateType(), False),
    T.StructField("card_type", T.StringType(), True),
    T.StructField("gate_in_boo", T.BooleanType(), True),
    T.StructField("pelanggan_count", T.LongType(), False),
    T.StructField("amount_sum", AMOUNT, True),
])

AGG_BY_ROUTE = T.StructType([
    T.StructField("tanggal", T.DateType(), False),
    T.StructField("route_code", T.StringType(), True),
    T.StructField("route_name", T.StringType(), True),
    T.StructField("gate_in_boo", T.BooleanType(), True),
    T.StructField("pelanggan_count", T.LongType(), False),
    T.StructField("amount_sum", AMOUNT, True),
])

AGG_BY_TARIFF = T.StructType([
    T.StructField("tanggal", T.DateType(), False),
    T.StructField("tarif", AMOUNT, True),
    T.StructField("gate_in_boo", T.BooleanType(), True),
    T.StructField("pelanggan_count", T.LongType(), False),
])

# --------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — see TESTDATA.md). Explicit
# schemas so scans never pay inference and column pruning is predictable.
# ``events.ts`` arrives as parquet TIMESTAMP(NANOS) which Spark reads as
# LongType under spark.sql.legacy.parquet.nanosAsLong; the loader converts.
# --------------------------------------------------------------------------

TESTDATA_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
