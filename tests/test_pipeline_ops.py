"""Semantic properties of the training-pipeline operators that the
hash-vs-oracle comparison can't express: LSH recall vs the exact
formulation, decode determinism, plumbing shapes."""

from pyspark.sql import functions as F

from flink_user_behavior_analysis_spark.operators import (
    brute_force_topk,
    decode_media,
    documents_as_media,
    hyperplane_lsh_topk,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
)
from flink_user_behavior_analysis_spark.operators.multimodal import (
    FEATURE_DIM,
    _fake_decode,
)
from flink_user_behavior_analysis_spark.sources import load_table


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    """Every planted near-dup (jaccard >= 0.8) must be recalled by the
    banded LSH; at j=0.8, k=12/b=4 the miss probability is ~0.2%."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, 0.8).collect()
    }
    assert exact, "test data should contain planted near-dups"
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 20), missed
    assert lsh <= exact  # verification step removes false positives


def test_minhash_lsh_fast_hash_same_recall(spark, sf_dir, monkeypatch):
    """SPARK_GRAFT_FAST_HASH=1 swaps md5 for xxhash64 in the signature
    seam; the verified pair set must still be a no-false-positive
    subset of the exact Jaccard pairs with near-total recall (the
    LSH guarantee is hash-agnostic)."""
    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, 0.8).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, 0.8).collect()
    }
    assert lsh <= exact
    missed = exact - lsh
    assert len(missed) <= max(1, len(exact) // 20), missed


def test_lsh_topk_subset_of_bruteforce_candidates(spark, sf_dir):
    """LSH top-k returns only true neighbors (cosine values must agree
    with the brute-force scoring for the same pairs)."""
    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 8)
    bf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(queries, embs, 50).collect()
    }
    for r in hyperplane_lsh_topk(queries, embs, 5).collect():
        key = (r.query_id, r.neighbor_id)
        if key in bf:
            assert abs(bf[key] - r.cosine) < 1e-9


def test_fake_decode_deterministic_and_shaped(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = documents_as_media(docs)
    rows = decode_media(media, decoder="fake").collect()
    assert len(rows) == 20
    by_id = {r.media_id: r for r in rows}
    src = {r.media_id: r.payload for r in media.collect()}
    for mid, r in by_id.items():
        assert len(r.feature) == FEATURE_DIM
        expected = _fake_decode(bytes(src[mid]))
        assert all(abs(a - b) < 1e-6 for a, b in zip(r.feature, expected))


def test_frame_sample_byte_windows_non_ascii(spark):
    """Frames are BYTE windows even when a boundary cuts a UTF-8
    codepoint; the hex-based fingerprint must match a host-side
    byte-slice reimplementation exactly (regression: a char-based
    oracle only agreed on ASCII payloads)."""
    import hashlib

    from flink_user_behavior_analysis_spark.operators import frame_sample

    text = "héllo wörld " * 10  # 140 bytes, boundaries cut codepoints
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = frame_sample(
        documents_as_media(docs), every_n_bytes=64, max_frames=8
    ).collect()
    payload = text.encode()
    exp = []
    for i in range(min(len(payload) // 64, 7) + 1):
        sl = payload[i * 64:(i + 1) * 64]
        exp.append((1, i, len(sl),
                    hashlib.sha256(sl.hex().upper().encode()).hexdigest()))
    got = sorted((r.media_id, r.frame_idx, r.frame_len, r.frame_sha256)
                 for r in rows)
    assert got == exp


def test_real_decoder_is_explicitly_stubbed(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(1)
    media = documents_as_media(docs)
    try:
        decode_media(media, decoder="real")
        raise AssertionError("real decoder should be stubbed")
    except NotImplementedError:
        pass


def test_quantization_error_bound(spark, sf_dir):
    """int8 quantization reconstructs every component within scale/2
    (symmetric rounding), and q codes stay in [-127, 127]."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        quantize_embeddings,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    joined = quantize_embeddings(embs).join(embs, "vec_id").limit(200)
    for r in joined.collect():
        assert -127 <= r.q_min <= r.q_max <= 127
        for x, qi in zip(r.embedding, r.q):
            assert abs(float(x) - qi * r.scale) <= r.scale / 2 + 1e-6


def test_cosine_lsh_invariant_in_n_blocks(spark, sf_dir):
    """The blocked-within-bucket decomposition is pure parallelism:
    the pair set must be byte-identical for any n_blocks."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        cosine_pairs_lsh,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    one = {(r.id_a, r.id_b, r.cosine)
           for r in cosine_pairs_lsh(embs, 0.4, n_blocks=1).collect()}
    four = {(r.id_a, r.id_b, r.cosine)
            for r in cosine_pairs_lsh(embs, 0.4, n_blocks=4).collect()}
    seven = {(r.id_a, r.id_b, r.cosine)
             for r in cosine_pairs_lsh(embs, 0.4, n_blocks=7).collect()}
    assert one == four == seven
    assert one, "smoke data should contain near-dup embeddings"


def test_cosine_lsh_multitable_recall(spark, sf_dir):
    """OR-construction: tables=2 finds every tables=1 pair plus
    (possibly) cross-bucket pairs table 0 missed; everything it emits
    is a true >= threshold pair with the exact cosine."""
    from flink_user_behavior_analysis_spark.operators.similarity import (
        cosine_pairs_blocked,
        cosine_pairs_lsh,
    )

    embs = load_table(spark, sf_dir, "embeddings")
    single = {(r.id_a, r.id_b): r.cosine
              for r in cosine_pairs_lsh(embs, 0.4, tables=1).collect()}
    multi = {(r.id_a, r.id_b): r.cosine
             for r in cosine_pairs_lsh(embs, 0.4, tables=2).collect()}
    exact = {(r.id_a, r.id_b): r.cosine
             for r in cosine_pairs_blocked(embs, 0.4).collect()}
    assert set(single) <= set(multi) <= set(exact)
    for key, cos in multi.items():
        assert abs(exact[key] - cos) < 1e-9


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=2 should recall a solid share of true top-5
    neighbors and score candidates with the exact cosine."""
    from flink_user_behavior_analysis_spark.operators.similarity import ivf_topk

    embs = load_table(spark, sf_dir, "embeddings")
    queries = embs.where(F.col("vec_id") < 8)
    truth = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in brute_force_topk(queries, embs, 5).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in ivf_topk(queries, embs, 5).collect()
    }
    assert ivf, "ivf returned nothing"
    for key, cos in ivf.items():
        if key in truth:
            assert abs(truth[key] - cos) < 1e-9
    recall = len(set(ivf) & set(truth)) / len(truth)
    assert recall >= 0.2, recall
