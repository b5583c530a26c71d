"""End-to-end verify at the library surface (.claude/skills/verify recipe).

Drives: CDC replay vs pandas oracle, fence no-op, schema-gate atomicity,
empty batch, zone-map filtered scans + stats-pruned tombstone vacuum +
rebase lineage (round 3), the partitioned-log source replay (round 3),
manifest-split metadata + rebucket + the kafka envelope adapter (round 4),
the oracle-reshaped queries vs DuckDB at sf0.01 (incl. emb_near_dup), and
the ETL surfaces (7-layout detection, xlsx, aux scans, datasheet attach).
Exit prints VERIFY PASS markers; any assertion failure is a real break."""
import shutil, tempfile, sys
sys.path.insert(0, "/root/repo")
import duckdb
import pandas as pd
from pyspark.sql import functions as F
from battetl_spark import get_spark
from battetl_spark import fixtures as FX
from battetl_spark.cdc import merge_apply
from battetl_spark.lake import LakeTable
from battetl_spark.lake.evolution import SchemaCompatibilityError
from battetl_spark.schemas import KEY_COLS, LAST_LSN_COL, TRANSCRIPT_TABLE_SCHEMA

spark = get_spark(master="local[8]", shuffle_partitions=8, app_name="verify")
ALL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts", LAST_LSN_COL]

d = tempfile.mkdtemp()
try:
    base = FX.make_transcripts(seed=11, n_convs=50, max_turns=10)
    ev = FX.make_change_events(seed=12, n_events=6000, n_convs=60, max_turns=10)
    tbl = LakeTable.create(spark, d + "/t", TRANSCRIPT_TABLE_SCHEMA,
                           num_buckets=8, bucket_key="conv_id",
                           key_cols=KEY_COLS, sort_cols=KEY_COLS)
    tbl.append(FX.table_rows_df(spark, base))
    # microbatch replay
    n = len(ev)
    last = None
    for i in range(4):
        batch = ev.iloc[i * n // 4:(i + 1) * n // 4]
        r = merge_apply(tbl, FX.change_events_df(spark, batch), epoch_id=i)
        assert r.applied
        last = batch
    got = tbl.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)
    exp = FX.pandas_oracle_replay(base, ev)[ALL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    v0 = tbl.snapshot()["version"]
    # replayed epoch = no-op
    r = merge_apply(tbl, FX.change_events_df(spark, last), epoch_id=3)
    assert not r.applied and tbl.snapshot()["version"] == v0, "fence broken"
    # incompatible schema must raise, no version bump
    bad = FX.change_events_df(spark, last).withColumn("role", F.lit(1.5))
    try:
        merge_apply(tbl, bad, epoch_id=99)
        raise AssertionError("expected SchemaCompatibilityError")
    except SchemaCompatibilityError:
        pass
    assert tbl.snapshot()["version"] == v0, "partial commit on bad schema"
    # empty batch
    r = merge_apply(tbl, FX.change_events_df(spark, ev.iloc[0:0]), epoch_id=100)
    assert not r.applied
    print("CDC surface: OK")

    # --- round-3 surfaces ---------------------------------------------
    # zone-map stats ride every commit; a bounded scan must skip files and
    # still return exactly the filtered rows
    snap = tbl.snapshot()
    assert any(
        "stats" in e and LAST_LSN_COL in e["stats"]
        for entries in snap["files"].values() for e in entries
    ), "no zone-map stats in snapshot"
    wm = int(ev["lsn"].max())
    assert tbl.scan(filters=[("_last_lsn", ">", wm)]).count() == 0
    assert len(tbl.scan(filters=[("_last_lsn", ">", wm)]).inputFiles()) == 0
    mid = wm // 2
    got_f = tbl.scan(filters=[("_last_lsn", ">", mid)]).count()
    exp_f = tbl.scan().filter(F.col(LAST_LSN_COL) > mid).count()
    assert got_f == exp_f, "filtered scan semantics broken"
    # stats-pruned tombstone vacuum: runs, drops all tombstones, state intact
    before_state = tbl.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS]
    tbl.vacuum_tombstones(below_lsn=wm + 10)
    assert tbl.scan(include_deleted=True).filter("_deleted").count() == 0
    assert tbl.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].equals(before_state)
    # rebase counter surfaces in lineage
    lin = tbl.lineage_df().toPandas()
    assert "rebases" in lin.columns and (lin["rebases"] >= 0).all()
    print("zone-map/vacuum/rebase surface: OK")

    # partitioned-log source: keyed routing + offset→lsn mapping replays to
    # the same payload state as the pandas oracle
    from battetl_spark.streaming import CdcStream, FilePartitionedLog

    log = FilePartitionedLog.create(spark, d + "/log", 4)
    part = F.pmod(F.xxhash64("conv_id"), F.lit(4)).cast("int")
    ev_df = FX.change_events_df(spark, ev)
    for p in (2, 0, 3, 1):  # partitions delivered out of order
        log.publish(ev_df.filter(part == p))
    t2 = LakeTable.create(spark, d + "/t2", TRANSCRIPT_TABLE_SCHEMA,
                          num_buckets=8, bucket_key="conv_id",
                          key_cols=KEY_COLS, sort_cols=KEY_COLS)
    CdcStream(t2, d + "/ckpt2").run_to_completion(
        log.read_stream(max_files_per_trigger=2))
    pay = [c for c in ALL_COLS if c != LAST_LSN_COL]
    got2 = t2.scan().orderBy(*KEY_COLS).toPandas()[pay].reset_index(drop=True)
    exp2 = FX.pandas_oracle_replay(None, ev)[pay].reset_index(drop=True)
    pd.testing.assert_frame_equal(got2, exp2, check_dtype=False)
    print("partitioned-log surface: OK")

    # merge-on-read: delta-append replay resolves to the identical state;
    # compaction folds deltas with no state change
    t3 = LakeTable.create(spark, d + "/t3", TRANSCRIPT_TABLE_SCHEMA,
                          num_buckets=8, bucket_key="conv_id",
                          key_cols=KEY_COLS, sort_cols=KEY_COLS)
    t3.append(FX.table_rows_df(spark, base))
    for i in range(4):
        batch = ev.iloc[i * n // 4:(i + 1) * n // 4]
        assert merge_apply(t3, FX.change_events_df(spark, batch), epoch_id=i,
                           mode="mor").applied
    snap3 = t3.snapshot()
    assert any(e.get("delta")
               for entries in snap3["files"].values() for e in entries)
    got3 = t3.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got3, exp, check_dtype=False)
    assert t3.compact(min_files_per_bucket=1) is not None
    assert not any(e.get("delta")
                   for entries in t3.snapshot()["files"].values() for e in entries)
    got3b = t3.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(got3b, exp, check_dtype=False)
    print("merge-on-read surface: OK")

    # --- round-4 surfaces ---------------------------------------------
    # manifest-split metadata: the root snapshot JSON must carry no inline
    # file entries, and a commit reuses unchanged buckets' manifests
    import json as _json, os as _o
    root = _json.load(open(_o.path.join(
        tbl.path, "metadata", f"v{tbl.snapshot()['version']:08d}.json")))
    assert "files" not in root and root.get("manifests_inv"), "manifest split broken"
    # rebucket: 8 → 32 keeps state byte-identical and pruning exact
    pre = tbl.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)
    assert tbl.rebucket(32)["num_buckets"] == 32
    post = tbl.scan().orderBy(*KEY_COLS).toPandas()[ALL_COLS].reset_index(drop=True)
    pd.testing.assert_frame_equal(post, pre)
    from battetl_spark.lake.table import bucket_expr
    some_b = int(tbl.scan().select(
        bucket_expr("conv_id", 32).alias("b")).first()["b"])
    chk = tbl.scan(buckets=[some_b]).select(
        bucket_expr("conv_id", 32).alias("b")).distinct().collect()
    assert [r["b"] for r in chk] == [some_b], "rebucket pruning broken"
    print("rebucket surface: OK")

    # kafka envelope adapter: file-log segments re-framed as kafka records
    # adapt back to the identical change-event envelope
    from battetl_spark.streaming import change_events_to_kafka, kafka_to_change_events
    env = log.read_all()
    back = kafka_to_change_events(change_events_to_kafka(env, 4), 4)
    a = env.orderBy("lsn").toPandas().reset_index(drop=True)
    b = back.orderBy("lsn").toPandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    print("kafka-envelope surface: OK")
finally:
    shutil.rmtree(d, ignore_errors=True)

import __spark_entry__ as E
sf = "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
for name in ["doc_minhash_dedup", "doc_simhash", "doc_ngram_jaccard",
             "ann_lsh_topk", "anti_join_new_keys", "ann_ivf_topk",
             "emb_near_dup", "doc_mixture_sample", "doc_source_cap",
             "doc_decontaminate", "doc_redact_pii", "doc_repetition"]:
    got = E.queries()[name](spark, sf).toPandas()
    exp = con.sql(E.oracle_sql()[name]).df()
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns), (name, cols, sorted(exp.columns))
    g = got[cols].sort_values(cols).reset_index(drop=True).astype(str)
    e = exp[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert g.equals(e), f"{name} values differ"
    print(f"query {name}: OK ({len(got)} rows)")
print("VERIFY PASS")

# ETL-surface drive (round-2 additions: 7-layout detection, xlsx, aux scans)
import tempfile as _tf, zipfile as _zf, os as _os
from battetl_spark.transform import detect_source, normalize_cycler_data
from battetl_spark.sources.config import read_unstructured
from battetl_spark.sources.schedule import schedule_bundle_from_files

hdr = ["Cycle", "Date", "AH-IN", "AH-OUT", "T1_Start", "T1_End", "T1_Min", "T1_Max"]
assert detect_source(hdr) == "vendor_m_stats"
df = spark.createDataFrame(
    [("1", "08/16/2026 10:00:00", "1.0", "0.9", "25", "26", "24", "27")], hdr)
row = normalize_cycler_data(df).collect()[0]
assert row["charge_capacity_mah"] == 1000.0
d2 = _tf.mkdtemp()
ns = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'
with _zf.ZipFile(_os.path.join(d2, "x.xlsx"), "w") as z:
    z.writestr("xl/worksheets/sheet1.xml",
        f'<worksheet {ns}><sheetData>'
        '<row><c r="A1" t="inlineStr"><is><t>a</t></is></c></row>'
        '<row><c r="A2"><v>7</v></c></row></sheetData></worksheet>')
assert read_unstructured(spark, _os.path.join(d2, "x.xlsx")).collect()[0].a == "7"
open(_os.path.join(d2, "s.ini"), "w").write("[Step1]\nm_szSteptype=Charge\n")
open(_os.path.join(d2, "w.mwf"), "w").write("RAW")
sched, steps, aux = schedule_bundle_from_files(
    [_os.path.join(d2, "s.ini"), _os.path.join(d2, "w.mwf")])
assert steps["chg"] == [1] and aux["w.mwf"] == "RAW"
print("ETL surface: OK")
print("VERIFY PASS (full)")

# binary datasheet dim attachment (round-2 parity item)
from battetl_spark.sources.config import attach_datasheet
_p = _os.path.join(d2, "cell.pdf"); open(_p, "wb").write(b"%PDF\x00\xff")
assert attach_datasheet({"datasheet": _p})["datasheet"] == b"%PDF\x00\xff"
print("datasheet: OK")

# CLI stage surface (round-5: -t writes the transformed artifact, -l re-loads
# it without extract/transform; console script maps to the same main())
import json as _json

from battetl_spark.__main__ import main as _cli_main
from battetl_spark.lake import LakeTable as _LT

_d3 = _tf.mkdtemp()
_csv = _os.path.join(_d3, "a.csv")
open(_csv, "w").write(
    "Data Point,Date Time,Test Time (s),Step Time (s),Cycle Index,"
    "Step Index,Current (A),Voltage (V),Power (W),Charge Capacity (Ah),"
    "Discharge Capacity (Ah),Charge Energy (Wh),Discharge Energy (Wh),"
    "Internal Resistance (Ohm),dV/dt (V/s),"
    "Aux_Temperature_1 (C),Aux_Temperature_2 (C)\n"
    "1,08/16/2026 10:00:00.000,100.5,10.5,3,2,0.5,3.65,1.825,1.5,0.0,5.5,"
    "0.0,0.012,0.001,24.5,24.7\n")
_cfg = {"data_file_path": [_csv], "table_path": _os.path.join(_d3, "lt")}
_cfgp = _os.path.join(_d3, "cfg.json")
open(_cfgp, "w").write(_json.dumps(_cfg))
assert _cli_main(["-t", _cfgp]) == 0
assert _os.path.isdir(_cfg["table_path"] + "_transformed")
_os.remove(_csv)  # -l must not need the raw input
assert _cli_main(["-l", _cfgp]) == 0
assert _LT.load(spark, _cfg["table_path"]).scan().count() == 1
print("CLI load-only surface: OK")

# out-of-order incremental cleaner surface, driven end to end by the
# Structured Streaming wrapper (round-5 post-close): a drop-folder of mod-3
# residue files — discovery order is NOT id order, so late smaller arrivals
# displace earlier decisions via CDC delete retractions — tailed with
# readStream + foreachBatch must converge to the batch clean_corpus answer
from battetl_spark.analytics import (
    CleanerStream, IncrementalCorpusCleaner, read_document_stream,
)
from battetl_spark.analytics import textops as _TX

_docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
    "doc_id", "text", "lang")
_exp = (_TX.clean_corpus(_docs, min_quality=0.5, langs=("en", "de"))
        .orderBy("doc_id").toPandas().reset_index(drop=True))
_d4 = _tf.mkdtemp()
for _r in (2, 0, 1):
    (_docs.filter(F.pmod(F.col("doc_id"), F.lit(3)) == _r)
     .coalesce(1).write.mode("append").parquet(_os.path.join(_d4, "drop")))
_cl = IncrementalCorpusCleaner.create(
    spark, _os.path.join(_d4, "c"), min_quality=0.5, langs=("en", "de"),
    ordered=False)
CleanerStream(_cl, _os.path.join(_d4, "ckpt")).run_to_completion(
    read_document_stream(spark, _os.path.join(_d4, "drop")))
_got = _cl.result().orderBy("doc_id").toPandas().reset_index(drop=True)
pd.testing.assert_frame_equal(_got, _exp)
print("ooo-cleaner stream surface: OK")

# clustered compaction + dup-cluster surfaces (round-5 post-close):
# compact(cluster_by=...) must turn an unskippable salt-split layout into
# disjoint-range files (narrow ts scan opens fewer files, same rows), and
# dup_clusters must close the near-dup pair graph transitively.
import numpy as _np

from battetl_spark.analytics.graph import dup_clusters

_d5 = _tf.mkdtemp()
_t5 = _LT.create(spark, _os.path.join(_d5, "t"), TRANSCRIPT_TABLE_SCHEMA,
                 num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_pdf = FX.make_transcripts(seed=77, n_convs=40, max_turns=6).reset_index(drop=True)
_pdf["_last_lsn"] = _np.arange(1, len(_pdf) + 1, dtype=_np.int64)
_pdf["_deleted"] = False
_pdf["ts"] = pd.Timestamp("2026-02-01") + pd.to_timedelta(
    (_np.arange(len(_pdf)) * 7919) % len(_pdf), "h")
_t5.append(spark.createDataFrame(
    _pdf[[f.name for f in TRANSCRIPT_TABLE_SCHEMA.fields]],
    TRANSCRIPT_TABLE_SCHEMA))
import datetime as _dt
_filt = [("ts", "<", _dt.datetime(2026, 2, 2))]
_exp5 = _t5.scan(filters=_filt).orderBy(*KEY_COLS).toPandas()
assert len(_t5.scan(filters=_filt).inputFiles()) == len(_t5.scan().inputFiles())
assert _t5.compact(min_files_per_bucket=1, cluster_by="ts",
                   files_per_bucket=4) is not None
assert 0 < len(_t5.scan(filters=_filt).inputFiles()) < len(_t5.scan().inputFiles())
_got5 = _t5.scan(filters=_filt).orderBy(*KEY_COLS).toPandas()
pd.testing.assert_frame_equal(
    _got5.reset_index(drop=True), _exp5.reset_index(drop=True))
print("clustered-compaction surface: OK")

_docs5 = spark.range(0, 8).withColumnRenamed("id", "doc_id")
_pairs5 = spark.createDataFrame([(7, 5), (5, 2), (0, 4)], "id_a long, id_b long")
_cl5 = {r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(_docs5, _pairs5).collect()}
assert _cl5 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 0, 5: 2, 6: 6, 7: 2}
_q5 = E.queries()["doc_dup_clusters"](spark, sf).toPandas()
_e5 = con.sql(E.oracle_sql()["doc_dup_clusters"]).df()
_c5 = sorted(_q5.columns)
assert _c5 == sorted(_e5.columns)
assert (_q5[_c5].sort_values(_c5).reset_index(drop=True).astype(str)
        .equals(_e5[_c5].sort_values(_c5).reset_index(drop=True).astype(str)))
print("dup-cluster surface: OK")

# cluster-representative keep-set (round-5 post-close session 2): longest
# member per dup cluster, min-id tiebreak, plus member counts — vs DuckDB
from battetl_spark.analytics.graph import cluster_representatives
_docs6 = spark.createDataFrame(
    [(i, 100 + (i * 13) % 7) for i in range(8)], "doc_id long, n_chars long")
_r6 = {r["cluster_id"]: (r["rep_id"], r["n_members"])
       for r in cluster_representatives(
           _docs6, dup_clusters(_docs6, _pairs5)).collect()}
# cluster {0,4}: n_chars 100 vs 103 -> rep 4; {2,5,7}: 105/102/100 -> rep 2
assert _r6[0] == (4, 2) and _r6[2] == (2, 3)
_q6 = E.queries()["doc_cluster_reps"](spark, sf).toPandas()
_e6 = con.sql(E.oracle_sql()["doc_cluster_reps"]).df()
_c6 = sorted(_q6.columns)
assert _c6 == sorted(_e6.columns)
assert (_q6[_c6].sort_values(_c6).reset_index(drop=True).astype(str)
        .equals(_e6[_c6].sort_values(_c6).reset_index(drop=True).astype(str)))
print("cluster-reps surface: OK")

# SCD-2 history surface (round-5 post-close session 2): incremental
# out-of-order ingest == batch history_rows; fenced replay no-op; LSN
# time travel equals the pandas prefix replay; oracle-reshaped queries
from battetl_spark.cdc import HistoryTable, history_rows
from battetl_spark.schemas import TRANSCRIPT_SCHEMA, LAST_LSN_COL as _LSN
_hev = FX.make_change_events(seed=11, n_events=4000, n_convs=30, max_turns=8,
                             dup_rate=0.05, shuffle_window=300)
_h = HistoryTable.create(
    spark, _tf.mkdtemp(prefix="vhist_") + "/t", TRANSCRIPT_SCHEMA,
    key_cols=["conv_id", "turn_idx"], num_buckets=8)
for _i, _r in enumerate((2, 0, 1)):
    assert _h.apply(FX.change_events_df(
        spark, _hev[_hev["lsn"] % 3 == _r]), epoch_id=_i).applied
assert not _h.apply(FX.change_events_df(
    spark, _hev[_hev["lsn"] % 3 == 1]), epoch_id=2).applied  # fenced replay
_hcols = ["conv_id", "turn_idx", "valid_from_lsn"]
_hb = (history_rows(FX.change_events_df(spark, _hev), ["conv_id", "turn_idx"])
       .orderBy(*_hcols).toPandas())
_hg = _h.history().select(*_hb.columns).orderBy(*_hcols).toPandas()
pd.testing.assert_frame_equal(_hg, _hb)
_L = int(_hev["lsn"].max() // 3)
_hexp = FX.pandas_oracle_replay(None, _hev[_hev["lsn"] <= _L]).drop(
    columns=[_LSN]).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
_hgot = (_h.state_as_of(_L).select(*_hexp.columns)
         .orderBy("conv_id", "turn_idx").toPandas())
pd.testing.assert_frame_equal(_hgot, _hexp)
for _q in ("cdc_history", "cdc_asof_state"):
    _qs = E.queries()[_q](spark, sf).toPandas()
    _es = con.sql(E.oracle_sql()[_q]).df()
    _cs = sorted(_qs.columns)
    assert _cs == sorted(_es.columns), _q
    assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
            .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str))), _q
print("scd2-history surface: OK")

# sequence-packing surface (round-5 post-close session 2): pack plan vs the
# DuckDB running-sum oracle + chunk-fullness sanity
_qp = E.queries()["doc_pack_sequences"](spark, sf).toPandas()
_ep = con.sql(E.oracle_sql()["doc_pack_sequences"]).df()
_cp = sorted(_qp.columns)
assert _cp == sorted(_ep.columns)
assert (_qp[_cp].sort_values(_cp).reset_index(drop=True).astype(str)
        .equals(_ep[_cp].sort_values(_cp).reset_index(drop=True).astype(str)))
_full = _qp.groupby("chunk_id")["n_toks"].sum()
assert (_full.iloc[:-1] == 128).all() and 0 < _full.iloc[-1] <= 128
print("sequence-packing surface: OK")

# chunk materialization: plan → packed sequences, vs DuckDB ordered agg
_qm = E.queries()["doc_pack_chunks"](spark, sf).toPandas()
_em = con.sql(E.oracle_sql()["doc_pack_chunks"]).df()
_cm = sorted(_qm.columns)
assert _cm == sorted(_em.columns)
assert (_qm[_cm].sort_values(_cm).reset_index(drop=True).astype(str)
        .equals(_em[_cm].sort_values(_cm).reset_index(drop=True).astype(str)))
print("chunk-materialization surface: OK")

# history retention GC: expire closed versions below the horizon; states at
# and above it unchanged; second pass is a zone-map-proved no-op
_pre = _h.state_as_of(_L).orderBy("conv_id", "turn_idx").toPandas()
assert _h.expire_versions(_L) is not None
pd.testing.assert_frame_equal(
    _h.state_as_of(_L).orderBy("conv_id", "turn_idx").toPandas(), _pre)
assert _h.expire_versions(_L) is None
print("history-retention surface: OK")

# exact-substring (k-token span) dedup surface (round-5 continuation):
# stats + strip vs their DuckDB oracles, plus the stripped corpus actually
# removing the duplicated mass the stats report
for _q in ("doc_span_stats", "doc_span_dedup"):
    _qs = E.queries()[_q](spark, sf).toPandas()
    _es = con.sql(E.oracle_sql()[_q]).df()
    _cs = sorted(_qs.columns)
    assert _cs == sorted(_es.columns), _q
    assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
            .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str))), _q
_st = E.queries()["doc_span_stats"](spark, sf).toPandas().set_index("doc_id")
_sp = E.queries()["doc_span_dedup"](spark, sf).toPandas().set_index("doc_id")
assert ((_st["n_toks"] - _st["dup_tokens"]) == _sp.loc[_st.index, "n_kept"]).all()
print("span-dedup surface: OK")

# deterministic split assignment (round-5 continuation): oracle equality +
# the partition being total over the corpus
_qs = E.queries()["doc_split_assign"](spark, sf).toPandas()
_es = con.sql(E.oracle_sql()["doc_split_assign"]).df()
_cs = sorted(_qs.columns)
assert _cs == sorted(_es.columns)
assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
        .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str)))
assert len(_qs) == con.sql("SELECT count(*) FROM documents").fetchone()[0]
print("split-assign surface: OK")

# TF-IDF top terms (round-5 continuation): bit-exact rational-idf ranking
# vs DuckDB, and exactly top_n rows per ranked document
_qt = E.queries()["doc_tfidf_terms"](spark, sf).toPandas()
_et = con.sql(E.oracle_sql()["doc_tfidf_terms"]).df()
_ct = sorted(_qt.columns)
assert _ct == sorted(_et.columns)
assert (_qt[_ct].sort_values(_ct).reset_index(drop=True).astype(str)
        .equals(_et[_ct].sort_values(_ct).reset_index(drop=True).astype(str)))
assert (_qt.groupby("doc_id")["rk"].max() <= 5).all()
print("tfidf surface: OK")

# incremental span index (round-5 continuation): per-batch union == the
# batch duplicate-occurrence oracle
_qs = E.queries()["doc_span_incremental"](spark, sf).toPandas()
_es = con.sql(E.oracle_sql()["doc_span_incremental"]).df()
_cs = sorted(_qs.columns)
assert _cs == sorted(_es.columns)
assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
        .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str)))
print("span-index surface: OK")

# behavioral funnel + CUBE profile (round-5 continuation)
for _q in ("event_funnel", "doc_corpus_profile"):
    _qs = E.queries()[_q](spark, sf).toPandas()
    _es = con.sql(E.oracle_sql()[_q]).df()
    _cs = sorted(_qs.columns)
    assert _cs == sorted(_es.columns), _q
    assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
            .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str))), _q
print("funnel/profile surface: OK")

# Z-order compaction (round-5 continuation): both-dimension file skipping
# on a fresh table, byte-identical results
import numpy as _np
import pandas as _pd
_d = tempfile.mkdtemp(prefix="zorder_")
_t2 = LakeTable.create(spark, _d + "/t", TRANSCRIPT_TABLE_SCHEMA,
                       num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_zpdf = FX.make_transcripts(seed=99, n_convs=100, max_turns=4).reset_index(drop=True)
_zpdf["_last_lsn"] = _np.arange(1, len(_zpdf) + 1, dtype=_np.int64)
_zpdf["_deleted"] = False
_n = len(_zpdf)
_zpdf["ts"] = _pd.Timestamp("2026-01-01") + _pd.to_timedelta((_np.arange(_n) * 7919) % _n, "h")
_zpdf["turn_idx"] = ((_np.arange(_n) * 104729) % 1000).astype(_np.int32)
_t2.append(spark.createDataFrame(
    _zpdf[[f.name for f in TRANSCRIPT_TABLE_SCHEMA.fields]], TRANSCRIPT_TABLE_SCHEMA))
import datetime as _dt
_fts = [("ts", "<", _dt.datetime(2026, 1, 2))]
_fti = [("turn_idx", "<", 120)]
_ets = _t2.scan(filters=_fts).toPandas()
_eti = _t2.scan(filters=_fti).toPandas()
assert _t2.compact(min_files_per_bucket=1, cluster_by=["ts", "turn_idx"],
                   files_per_bucket=8) is not None
_tot = len(_t2.scan().inputFiles())
assert 0 < len(_t2.scan(filters=_fts).inputFiles()) < _tot
assert 0 < len(_t2.scan(filters=_fti).inputFiles()) < _tot
_k = ["conv_id", "turn_idx", "_last_lsn"]
for _got, _exp in ((_t2.scan(filters=_fts).toPandas(), _ets),
                   (_t2.scan(filters=_fti).toPandas(), _eti)):
    _a = _got.sort_values(_k).reset_index(drop=True)
    _b = _exp.sort_values(_k).reset_index(drop=True)
    _pd.testing.assert_frame_equal(_a, _b)
shutil.rmtree(_d, ignore_errors=True)
print("zorder surface: OK")

# retention + frequent n-grams (round-5 continuation): oracle-reshaped
for _q in ("event_retention", "doc_frequent_ngrams", "event_quantiles"):
    _qs = E.queries()[_q](spark, sf).toPandas()
    _es = con.sql(E.oracle_sql()[_q]).df()
    _cs = sorted(_qs.columns)
    assert _cs == sorted(_es.columns), _q
    assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
            .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str))), _q
print("retention/ngrams surface: OK")

# bulk predicate delete through the CDC merge path (round-5 continuation)
from battetl_spark.cdc import delete_where as _dw
_dd = tempfile.mkdtemp(prefix="delw_")
_t3 = LakeTable.create(spark, _dd + "/t", TRANSCRIPT_TABLE_SCHEMA,
                       num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_bw = FX.make_transcripts(seed=5, n_convs=15, max_turns=5)
_t3.append(FX.table_rows_df(spark, _bw))
_rw = _dw(_t3, filters=[("turn_idx", ">=", 3)], epoch_id=1)
assert _rw.applied and _rw.rows_deleted == int((_bw.turn_idx >= 3).sum())
assert _t3.scan().filter("turn_idx >= 3").count() == 0
assert _t3.scan().count() == int((_bw.turn_idx < 3).sum())
assert not _dw(_t3, filters=[("turn_idx", ">=", 3)], epoch_id=1).applied
shutil.rmtree(_dd, ignore_errors=True)
print("delete-where surface: OK")

# snapshot tags (round-5 continuation): pin, churn, vacuum, replay
_td = tempfile.mkdtemp(prefix="tags_")
_t4 = LakeTable.create(spark, _td + "/t", TRANSCRIPT_TABLE_SCHEMA,
                       num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_t4.append(FX.table_rows_df(spark, FX.make_transcripts(seed=8, n_convs=10, max_turns=4)))
_pin = _t4.scan().orderBy("conv_id", "turn_idx").toPandas()
_t4.tag("train-v1")
from battetl_spark.cdc import merge_apply as _ma
for _i in range(1, 4):
    _ma(_t4, FX.change_events_df(spark, FX.make_change_events(
        seed=40 + _i, n_events=300, n_convs=12, max_turns=4)), epoch_id=_i)
_t4.vacuum_files(keep_snapshots=1)
_back = _t4.scan_at("train-v1").orderBy("conv_id", "turn_idx").toPandas()
import pandas as _pd2
_pd2.testing.assert_frame_equal(_back, _pin)
shutil.rmtree(_td, ignore_errors=True)
print("snapshot-tags surface: OK")

# column drop / masked re-add (round-5 continuation)
_ed = tempfile.mkdtemp(prefix="dropcol_")
_t5 = LakeTable.create(spark, _ed + "/t", TRANSCRIPT_TABLE_SCHEMA,
                       num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_t5.append(FX.table_rows_df(spark, FX.make_transcripts(seed=9, n_convs=10, max_turns=4)))
_vpre = _t5.snapshot()["version"]
_hadtool = _t5.scan().filter("tool is not null").count()
_t5.drop_column("tool")
assert "tool" not in _t5.scan().columns
assert _t5.scan_at(_vpre).filter("tool is not null").count() == _hadtool
_evr = FX.make_change_events(seed=77, n_events=200, n_convs=12, max_turns=4)
_evr["tool"] = "fresh"
_ma(_t5, FX.change_events_df(spark, _evr), epoch_id=1)
_fr = _t5.scan().filter("tool is not null")
assert _fr.count() > 0 and _fr.filter("tool != 'fresh'").count() == 0
shutil.rmtree(_ed, ignore_errors=True)
print("drop-column surface: OK")

# column rename (round-5 continuation): alias read-through + chain
_rd = tempfile.mkdtemp(prefix="rencol_")
_t6 = LakeTable.create(spark, _rd + "/t", TRANSCRIPT_TABLE_SCHEMA,
                       num_buckets=2, key_cols=KEY_COLS, sort_cols=KEY_COLS)
_t6.append(FX.table_rows_df(spark, FX.make_transcripts(seed=13, n_convs=10, max_turns=4)))
_orig = _t6.scan().filter("tool is not null").count()
assert _orig > 0
_t6.rename_column("tool", "tool_name")
assert _t6.scan().filter("tool_name is not null").count() == _orig
_t6.rename_column("tool_name", "tool_kind")
assert _t6.scan().filter("tool_kind is not null").count() == _orig
shutil.rmtree(_rd, ignore_errors=True)
print("rename-column surface: OK")

# sliding-window distinct actives (round-5 continuation)
_qs = E.queries()["event_active_users"](spark, sf).toPandas()
_es = con.sql(E.oracle_sql()["event_active_users"]).df()
_cs = sorted(_qs.columns)
assert _cs == sorted(_es.columns)
assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
        .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str)))
print("active-users surface: OK")

# relational pivot as single-pass conditional counts (round-5 continuation)
_qs = E.queries()["event_pivot"](spark, sf).toPandas()
_es = con.sql(E.oracle_sql()["event_pivot"]).df()
_cs = sorted(_qs.columns)
assert _cs == sorted(_es.columns)
assert (_qs[_cs].sort_values(_cs).reset_index(drop=True).astype(str)
        .equals(_es[_cs].sort_values(_cs).reset_index(drop=True).astype(str)))
print("pivot surface: OK")
