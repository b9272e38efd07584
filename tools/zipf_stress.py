"""Zipf-skew stress run over the salted / token-keyed paths.

Run `python tools/make_zipf.py` first. For each operator this times
the SAME computation on the zipf-skewed table and its same-sized
uniform control (best of 2 after a pool warm-up) and reports the
zipf/uniform wall ratio — ~1.0 means the skew never lands on an
exchange that cares; >>1 means a hot key is serializing a stage.

Covered (PERF.md's flagged risks + VERDICT r4 item 3):
  - windowed per-key count (A1 shape) under an 18%-hot item key
  - global windowed count: one-operator form vs explicit
    salted_two_stage_count (M1) — is the salt ever needed?
  - shuffle join with an 18%-hot key: plain sort-merge with AQE skew
    split ON vs OFF vs operators.skew.salted_join (broadcast disabled
    to model a right side too big to broadcast)
  - token_vocab / tf_idf_top_terms under a degenerate vocabulary
    (top token ~8% of all token mass — the "second exchange" risk)
  - minhash_lsh_pairs bucket behavior on the degenerate vocab, with
    the max_bucket production guard

Prints one markdown table and one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_user_behavior_analysis_spark.operators.dedup import (  # noqa: E402
    minhash_lsh_pairs,
)
from flink_user_behavior_analysis_spark.operators.skew import (  # noqa: E402
    salted_join,
)
from flink_user_behavior_analysis_spark.operators.text import (  # noqa: E402
    tf_idf_top_terms,
    token_vocab,
)
from flink_user_behavior_analysis_spark.operators.windows import (  # noqa: E402
    salted_two_stage_count,
    windowed_count,
    windowed_global_count,
)
from flink_user_behavior_analysis_spark.session import get_spark  # noqa: E402

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf"


def best_of(fn, n: int = 2) -> float:
    walls = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        walls.append(time.monotonic() - t0)
    return min(walls)


def main() -> None:
    spark = get_spark(app="zipf-stress")
    ev = {
        v: spark.read.parquet(f"{DATA}/events_{v}.parquet")
        for v in ("zipf", "uniform")
    }
    docs = {
        v: spark.read.parquet(f"{DATA}/docs_{v}.parquet")
        for v in ("zipf", "uniform")
    }
    dim = spark.read.parquet(f"{DATA}/dim.parquet")
    # warm the executor python/JVM pools before any timing
    for v in ("zipf", "uniform"):
        ev[v].count(), docs[v].count()
    dim.count()

    rows: list[dict] = []

    def add(op: str, zipf_s: float, uni_s: float, note: str) -> None:
        rows.append({
            "op": op, "zipf_s": round(zipf_s, 2), "uniform_s": round(uni_s, 2),
            "ratio": round(zipf_s / uni_s, 2) if uni_s else None, "note": note,
        })
        print(f"  {op}: zipf {zipf_s:.2f}s uniform {uni_s:.2f}s")

    # A1: per-key sliding count, hot item key
    t = {v: best_of(lambda v=v: windowed_count(
        ev[v], "ts", ["item_id"], "1 hour", "5 minutes").count())
        for v in ev}
    add("windowed_count(item_id)", t["zipf"], t["uniform"],
        "map-side combine folds the hot key per task before the shuffle")

    # r11: per-key frequency cap under the hot domain — the
    # structural-skew case the operator exists for (a dominating
    # source is exactly what gets capped)
    from flink_user_behavior_analysis_spark.operators.sampling import (
        frequency_cap,
    )
    t = {v: best_of(lambda v=v: frequency_cap(
        ev[v], ["item_id"], 100,
        [F.col("ts").desc(), F.col("event_id").asc()])
        .where(F.col("kept")).count())
        for v in ev}
    add("frequency_cap(item_id)", t["zipf"], t["uniform"],
        "row_number window on the 18%-hot key; the hot key's sort is "
        "one task's input — AQE skew split bounds it")

    # r12: as-of join — a window CARRY cannot be row-salted, so the
    # hot key's whole history sorts in one task; the hybrid routes
    # keys above hot_key_threshold through the segmented-scan path.
    # The consumer hashes the match columns: a bare count() lets
    # Catalyst PRUNE the window entirely and times an empty plan
    # (bit us in the first r12 measurement).
    from flink_user_behavior_analysis_spark.operators.asof import (
        asof_join,
    )

    def asof_wall(v: str, **kw) -> float:
        def go():
            left = ev[v].where(F.col("behavior") == "buy")
            right = ev[v].where(F.col("behavior") == "pv")
            out = asof_join(left, right, ["item_id"], "ts", "ts",
                            right_cols=["event_id"],
                            order_tiebreak=["event_id"], **kw)
            out.agg(F.sum(F.xxhash64("ts_asof", "event_id_asof")
                          % F.lit(10**12))).collect()
        return best_of(go)

    t_plain = {v: asof_wall(v) for v in ev}
    add("asof_join(item_id) plain", t_plain["zipf"], t_plain["uniform"],
        "single window pass: the hot key's carry sorts in ONE task")
    t_hyb = {v: asof_wall(v, slice_seconds=3607 / 64,
                          hot_key_threshold=500_000) for v in ev}
    add("asof_join(item_id) hybrid", t_hyb["zipf"], t_hyb["uniform"],
        "keys >500k rows take the segmented-scan path (time-sliced "
        "local carry + per-key prefix over slice summaries); cold "
        "keys keep the plain window")

    # M2 vs M1: global count, plain vs explicitly salted
    t_plain = best_of(lambda: windowed_global_count(
        ev["zipf"], "ts", "1 hour", "5 minutes").count())
    t_salt = best_of(lambda: salted_two_stage_count(
        ev["zipf"], "ts", "1 hour", "5 minutes",
        salt_col="user_id").count())
    add("global_count plain vs salted", t_salt, t_plain,
        "ratio is salted/plain on the SAME zipf input: the explicit "
        "M1 salt only adds a second exchange — partial agg already "
        "handles the constant key")

    # hot-key shuffle join (broadcast disabled to model a big right side)
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        expected = {v: None for v in ev}

        def plain(v: str) -> int:
            return ev[v].join(dim, "item_id", "inner").count()

        t = {v: best_of(lambda v=v: plain(v)) for v in ev}
        expected = {v: plain(v) for v in ev}
        add("shuffle_join AQE-on", t["zipf"], t["uniform"],
            "AQE skew split handles the 18% key at runtime")

        spark.conf.set("spark.sql.adaptive.enabled", "false")
        t_noaqe = best_of(lambda: plain("zipf"))
        t_salted = best_of(lambda: salted_join(
            ev["zipf"], dim, ["item_id"], salt_buckets=16,
            salt_on=["event_id"]).count())
        n_salted = salted_join(ev["zipf"], dim, ["item_id"],
                               salt_buckets=16, salt_on=["event_id"]).count()
        assert n_salted == expected["zipf"], (n_salted, expected["zipf"])
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        add("shuffle_join AQE-off plain vs salted", t_salted, t_noaqe,
            "no-AQE case salted_join exists for; rows verified equal")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    # degenerate vocabulary: token-keyed second exchanges
    t = {v: best_of(lambda v=v: token_vocab(docs[v], 100).count())
         for v in docs}
    add("token_vocab", t["zipf"], t["uniform"],
        "level-1 (doc,token) agg dedups the hot token map-side; "
        "level-2 exchange sees one row per (doc,token)")
    t = {v: best_of(lambda v=v: tf_idf_top_terms(docs[v], 5).count())
         for v in docs}
    add("tfidf_top_terms", t["zipf"], t["uniform"],
        "df window partition for the hot token = its doc count")

    # minhash buckets under the degenerate vocab (production guard on)
    from flink_user_behavior_analysis_spark.operators.dedup import (
        minhash_signatures,
    )
    bucket_stats = {}
    for v in docs:
        sigs = minhash_signatures(docs[v], k=12)
        bh = F.array(*[
            F.md5(F.concat_ws(",", *[F.col(f"mh{b * 3 + j}").cast("string")
                                     for j in range(3)]))
            for b in range(4)
        ])
        buckets = sigs.select(F.posexplode(bh).alias("band", "bucket"))
        mx = (buckets.groupBy("band", "bucket").count()
              .agg(F.max("count")).first()[0])
        bucket_stats[v] = mx
    # min-of-2 is load-bearing: the FIRST execution of a plan shape
    # pays whole-stage-codegen JIT (~4s here), which otherwise lands
    # entirely on whichever variant runs first and fakes a skew signal
    t, pairs = {}, {}
    for v in docs:
        t[v] = best_of(
            lambda v=v: minhash_lsh_pairs(
                docs[v], threshold=0.5, max_bucket=50).count(), n=2)
        pairs[v] = minhash_lsh_pairs(docs[v], 0.5, max_bucket=50).count()
    add("minhash_lsh max_bucket=50", t["zipf"], t["uniform"],
        f"max raw bucket zipf={bucket_stats['zipf']} "
        f"uniform={bucket_stats['uniform']}; pairs "
        f"z={pairs['zipf']} u={pairs['uniform']} — cap bounds the join")

    # boilerplate templates: the degenerate-bucket case the cap is FOR.
    # 10 templates x 400 near-copies -> every copy shares its
    # template's LSH buckets; uncapped, the bucket self-join faces
    # ~bands x C(400,2) candidates per template (3.2M) and the exact
    # jaccard verify pays for each; capped, those buckets are dropped
    # whole (documented recall trade: boilerplate clusters are
    # handled by exact_dedup / dedup_clusters at scale, not pairwise)
    boiler = spark.read.parquet(f"{DATA}/docs_boiler.parquet")
    boiler.count()
    sigs_b = minhash_signatures(boiler, k=12)
    bh = F.array(*[
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * 3 + j}").cast("string")
                                 for j in range(3)]))
        for b in range(4)
    ])
    mx_boiler = (sigs_b.select(F.posexplode(bh).alias("band", "bucket"))
                 .groupBy("band", "bucket").count()
                 .agg(F.max("count")).first()[0])
    t_cap = best_of(lambda: minhash_lsh_pairs(
        boiler, threshold=0.9, max_bucket=50).count(), n=2)
    p_cap = minhash_lsh_pairs(boiler, 0.9, max_bucket=50).count()
    t_uncap = best_of(lambda: minhash_lsh_pairs(
        boiler, threshold=0.9).count(), n=2)
    p_uncap = minhash_lsh_pairs(boiler, 0.9).count()
    # span dedup under hot fingerprints: every template span has 400
    # instances — the counter path (groupBy fp) must absorb it; the
    # output grows (4k docs become fully covered) but no pair join
    # exists to explode
    from flink_user_behavior_analysis_spark.operators.chunking import (
        duplicated_spans,
    )
    t_sp = {
        "boiler": best_of(lambda: duplicated_spans(boiler, 8).count(), n=2),
        "uniform": best_of(
            lambda: duplicated_spans(docs["uniform"], 8).count(), n=2),
    }
    add("duplicated_spans boiler-vs-uniform", t_sp["boiler"],
        t_sp["uniform"],
        "400-instance template fingerprints fold in the fp groupBy — "
        "counter cost, not pairs")

    # the CUT transform under the same degeneracy: boilerplate is the
    # worst case for the covered-position explode (nearly every token
    # of every copy is covered), but that explode is bounded by TOTAL
    # corpus tokens — linear, never pairs — and the reassembly shuffle
    # keys on doc_id (uniform by construction)
    from flink_user_behavior_analysis_spark.operators.chunking import (
        remove_duplicated_spans,
    )
    t_rm = {
        "boiler": best_of(
            lambda: remove_duplicated_spans(boiler, 8).count(), n=2),
        "uniform": best_of(
            lambda: remove_duplicated_spans(docs["uniform"], 8).count(),
            n=2),
    }
    add("remove_dup_spans boiler-vs-uniform", t_rm["boiler"],
        t_rm["uniform"],
        "full-coverage worst case: covered-explode = corpus tokens "
        "(linear), doc-keyed reassembly uniform")

    add("minhash_lsh boilerplate cap-vs-uncapped", t_cap, t_uncap,
        f"max raw bucket={mx_boiler}; verified pairs capped={p_cap} "
        f"uncapped={p_uncap}: uncapped pays all-pairs candidate "
        "verification inside each template bucket; the cap drops "
        "those buckets whole (boilerplate clusters belong to "
        "exact_dedup/dedup_clusters, not pairwise LSH)")

    print("\n| op | zipf | uniform | ratio | note |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['op']} | {r['zipf_s']} s | {r['uniform_s']} s "
              f"| {r['ratio']}x | {r['note']} |")
    print(json.dumps({"rows": rows}))


if __name__ == "__main__":
    main()
