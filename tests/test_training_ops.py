"""Training-data pipeline ops: dedup positives/negatives, similarity recall,
text kernels, multimodal plumbing + stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osmgraft.operators.dedup import (
    dedup_exact_groups,
    minhash_lsh_pairs,
    simhash_table,
)
from osmgraft.operators.multimodal import (
    image_stats,
    phash_near_dup_pairs,
    video_frame_sample,
)
from osmgraft.operators.similarity import cosine_topk, lsh_ann_topk


@pytest.fixture(scope="module")
def crafted_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again in the park"
    near = base.replace("park", "garden")  # high jaccard
    far = "completely different words describing unrelated machine learning things"
    rows = [
        (1, base), (2, base), (3, "  " + base.upper() + "  "),  # exact (normalized) dups
        (4, near), (5, far), (6, ""), (7, "one two"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dedup_exact_normalized(spark, crafted_docs):
    groups = dedup_exact_groups(crafted_docs).collect()
    assert len(groups) == 1
    assert groups[0].n_dups == 3 and groups[0].canonical_id == 1  # case+ws normalized


def test_minhash_lsh_finds_near_dups(spark, crafted_docs):
    pairs = {
        (r.doc_a, r.doc_b): (r.inter_cnt, r.union_cnt)
        for r in minhash_lsh_pairs(crafted_docs, jaccard_threshold=0.5).collect()
    }
    assert (1, 2) in pairs and (1, 3) in pairs and (2, 3) in pairs  # exact dups
    assert (1, 4) in pairs or (2, 4) in pairs  # near dup caught
    assert all(5 not in p and 6 not in p and 7 not in p for p in pairs)


def test_jaccard_ngram_exact_superset_of_lsh(spark, crafted_docs):
    """Exact inverted-index Jaccard finds every pair the probabilistic LSH
    path finds (recall property), with identical counts on shared pairs;
    max_df pruning drops pairs whose overlap is only common shingles."""
    from osmgraft.operators.dedup import jaccard_ngram_pairs

    exact = {
        (r.doc_a, r.doc_b): (r.inter_cnt, r.union_cnt)
        for r in jaccard_ngram_pairs(crafted_docs, jaccard_threshold=0.5).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b): (r.inter_cnt, r.union_cnt)
        for r in minhash_lsh_pairs(crafted_docs, jaccard_threshold=0.5).collect()
    }
    assert set(lsh) <= set(exact)
    assert all(exact[k] == lsh[k] for k in lsh)
    assert (1, 2) in exact and (1, 3) in exact and (2, 3) in exact
    capped = {
        (r.doc_a, r.doc_b)
        for r in jaccard_ngram_pairs(
            crafted_docs, jaccard_threshold=0.5, max_df=1
        ).collect()
    }
    assert capped == set()  # df cap 1 kills every shared shingle


def test_simhash_properties(spark, crafted_docs):
    rows = {r.doc_id: r.simhash for r in simhash_table(crafted_docs).collect()}
    assert rows[1] == rows[2] == rows[3]  # identical token sets
    assert rows[6] == 0  # empty doc
    ham_near = bin(rows[1] ^ rows[4]).count("1")
    ham_far = bin(rows[1] ^ rows[5]).count("1")
    assert ham_near < ham_far


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(21)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    vecs[1] = vecs[0] + 0.01 * rng.standard_normal(16).astype(np.float32)  # near-dup pair
    return spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )


def test_cosine_topk_exact(spark, emb):
    got = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    by_rank = {r.rank: r.neighbor_id for r in got}
    assert by_rank[1] == 0  # self
    assert by_rank[2] == 1  # planted near-dup
    # verify rank 3 against numpy brute force
    rows = emb.orderBy("vec_id").collect()
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    sims = (m @ m[0]) / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[0]))
    assert by_rank[3] == int(np.argsort(-sims)[2])


def test_lsh_ann_recall(spark, emb):
    exact = cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    approx = lsh_ann_topk(
        emb, emb.filter(F.col("vec_id") < 10), k=5, dim=16, n_planes=4, n_tables=6
    )
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.6, recall  # multi-table ANN: imperfect but useful
    # self must always be found (same bucket by construction)
    assert all((q, q) in a for q in range(10))


def test_image_stats_exact(spark):
    from osmgraft.synth import synth_images, _pixels_for

    df = image_stats(synth_images(spark, 20))
    rows = {r.image_id: r for r in df.collect()}
    assert len(rows) == 20
    # lossless rows decode to the exact generator pixels:
    # idx 5 -> fmt raw (5%5==0), w=sizes[5%3]=64, h=sizes[(5//3)%3]=32
    # idx 8 -> fmt png (8%5==3), w=sizes[8%3]=64, h=sizes[(8//3)%3]=64
    for idx, w, h in ((5, 64, 32), (8, 64, 64)):
        px = _pixels_for(idx, w, h)
        got = rows[f"img{idx:012d}"]
        s = px.reshape(-1, 3).sum(axis=0)
        assert (got.sum_r, got.sum_g, got.sum_b) == (
            int(s[0]), int(s[1]), int(s[2])), idx


def test_image_stats_matches_scalar_decode(spark):
    """The batched Arrow-buffer decode path row-for-row equals an independent
    per-row scalar decode (decode_image + phash64) across all five formats
    and all (w, h) combinations."""
    import numpy as np

    from osmgraft.functions.codec import decode_image, phash64
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 90)
    got = {r.image_id: r for r in image_stats(imgs).collect()}
    src = imgs.select("image_id", "bytes", "w", "h", "fmt").collect()
    assert {r.fmt for r in src} == {"raw", "ppm", "qdct", "png", "jpeg"}
    for r in src:
        px = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        s = px.reshape(-1, 3).sum(axis=0, dtype=np.int64)
        g = got[r.image_id]
        assert (g.sum_r, g.sum_g, g.sum_b, g.phash) == (
            int(s[0]),
            int(s[1]),
            int(s[2]),
            int(phash64(px)),
        ), r.image_id


def test_image_stats_pinned_checksum(spark):
    """Whole-table pinned aggregate: a silently wrong channel sum or pHash
    anywhere in the 500-image synthetic table fails loudly (VERDICT r1)."""
    from pyspark.sql import functions as F
    from osmgraft.synth import synth_images

    row = (
        image_stats(synth_images(spark, 500))
        .agg(
            F.sum("sum_r").alias("r"),
            F.sum("sum_g").alias("g"),
            F.sum("sum_b").alias("b"),
            F.sum(F.col("phash") % 1000003).alias("ph"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    # re-pinned round 3 (4x): png then jpeg joined the fmt rotation, the
    # DCT/luma kernels went fixed-point integer (FLOAT pins drifted between
    # driver rounds: BLAS builds round the cosine matmuls differently per
    # host), and the rotation gained a 25-row phase shift so formats decouple
    # from the hot-spot/near-dup cycles; these integer pins are host-invariant
    # (cross-checked row-for-row by test_image_stats_matches_scalar_decode)
    assert (row.r, row.g, row.b, row.ph, row.n) == (
        88319982,
        88299059,
        88330492,
        -249965799,
        500,
    )


def test_image_resize_gray32_pinned(spark):
    """Pinned sha256 over the ordered 32×32 thumbnails (batched resize path)."""
    import hashlib

    from osmgraft.synth import synth_images
    from osmgraft.operators.multimodal import image_resize_gray32

    rows = image_resize_gray32(synth_images(spark, 64)).orderBy("image_id").collect()
    assert len(rows) == 64
    h = hashlib.sha256(b"".join(bytes(r.gray32) for r in rows)).hexdigest()
    # re-pinned round 3 (png in the fmt rotation; then fixed-point integer
    # luma/resize — half-up milli-gray -> uint8 replaced float floor)
    assert h == "2074d1143dc9de3e8d61b5017c1c29d3c7618ea8bfdaa1a5194e837a115dd6cc"


def test_phash_neardup_pairs(spark):
    from osmgraft.synth import synth_images

    pairs = phash_near_dup_pairs(synth_images(spark, 200), max_hamming=8).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # planted near-dups at (48,49), (98,99), (148,149), (198,199)
    for a in (48, 98, 148):
        pa, pb = f"img{a:012d}", f"img{a + 1:012d}"
        assert (pa, pb) in found, (pa, pb, sorted(found)[:5])


def test_phash_neardup_full_recall_vs_bruteforce(spark):
    """The banding guarantee (n_bands = max_hamming + 1 ⇒ recall 1.0 at the
    advertised radius) checked against exact all-pairs hamming."""
    from osmgraft.functions.codec import hamming64
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 150)
    hashes = {r.image_id: r.phash for r in imgs.select("image_id", "phash").collect()}
    ids = sorted(hashes)
    for radius in (0, 3, 8):
        exact = {
            (a, b): hamming64(hashes[a], hashes[b])
            for i, a in enumerate(ids)
            for b in ids[i + 1 :]
            if hamming64(hashes[a], hashes[b]) <= radius
        }
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in phash_near_dup_pairs(imgs, max_hamming=radius).collect()
        }
        assert got == exact, (radius, set(exact) ^ set(got))


def test_video_stub_raises(spark):
    media = spark.createDataFrame([("m1", b"\x00" * 16)], "media_id string, bytes binary")
    with pytest.raises(Exception, match="video decode stubbed"):
        video_frame_sample(media, decoder="stub").collect()


def test_video_fake_plumbing(spark):
    media = spark.createDataFrame(
        [("m1", b"\x01" * 16), ("m2", b"\x02" * 16)], "media_id string, bytes binary"
    )
    rows = video_frame_sample(media, frames_per_clip=3, decoder="fake").collect()
    assert len(rows) == 6
    assert {(r.media_id, r.frame_idx) for r in rows} == {
        (m, i) for m in ("m1", "m2") for i in range(3)
    }
    # deterministic: same payload → same phash
    again = video_frame_sample(media, frames_per_clip=3, decoder="fake").collect()
    assert {(r.media_id, r.frame_idx, r.frame_phash) for r in rows} == {
        (r.media_id, r.frame_idx, r.frame_phash) for r in again
    }


def test_y4m_roundtrip_and_errors():
    """encode_y4m/y4m_parse roundtrip (mono + 444) and corrupt payloads."""
    import numpy as np

    from osmgraft.operators.multimodal import encode_y4m, y4m_parse

    rng = np.random.default_rng(5)
    luma = rng.integers(0, 256, (4, 12, 20), dtype=np.uint8)
    w, h, cs, back = y4m_parse(encode_y4m(luma, "mono"))
    assert (w, h, cs) == (20, 12, "mono") and np.array_equal(back, luma)
    yuv = rng.integers(0, 256, (3, 3, 8, 10), dtype=np.uint8)
    w, h, cs, back = y4m_parse(encode_y4m(yuv, "444"))
    assert (w, h, cs) == (10, 8, "444") and np.array_equal(back, yuv[:, 0])
    data = encode_y4m(luma, "mono")
    for bad in (b"JUNK" + data[4:],        # bad magic
                data[:-5],                 # truncated frame
                data.replace(b"FRAME\n", b"FRAMX\n", 1)):  # bad marker
        with pytest.raises(ValueError):
            y4m_parse(bad)
    with pytest.raises(ValueError):  # unsupported colorspace
        y4m_parse(b"YUV4MPEG2 W2 H2 F25:1 C420jpeg\n" + b"FRAME\n" + b"\0" * 6)


def test_video_y4m_fast_path_equals_fallback(spark):
    """The uniform one-reshape fast path emits row-identical results to the
    per-row parse path, and luma sums match the generator arithmetic."""
    from osmgraft.operators.multimodal import video_frame_sample
    from osmgraft.synth import synth_videos

    uni = video_frame_sample(synth_videos(spark, 24, uniform=True)).collect()
    # force the fallback: one clip per partition breaks batch contiguity
    fb = video_frame_sample(
        synth_videos(spark, 24, uniform=True).repartition(24)).collect()
    assert sorted(map(tuple, uni)) == sorted(map(tuple, fb))
    # varying-length clips (the oracle-gated query shape)
    rows = video_frame_sample(synth_videos(spark, 9)).collect()
    assert len(rows) == 27
    for r in rows:
        i = int(r.media_id[3:])
        f, y, x = r.frame_idx, *np.meshgrid(np.arange(16), np.arange(16))
        want = int(((i * 31 + f * 17 + y * 5 + x * 3) % 256).sum())
        assert r.luma_sum == want, (r.media_id, r.frame_idx)
        nf = 4 + i % 3
        assert r.frame_idx in {(k * (nf - 1)) // 2 for k in range(3)}


def test_audio_window_energy_fake_decoder(spark):
    """Audio plumbing: deterministic fake PCM, partition-count independent."""
    from pyspark.sql import functions as F

    from osmgraft.operators.multimodal import audio_window_energy

    media = spark.range(20).select(
        F.concat(F.lit("clip"), F.col("id")).alias("media_id"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("bytes"),
    )
    a = sorted(map(tuple, audio_window_energy(media, decoder="fake").collect()))
    b = sorted(
        map(
            tuple,
            audio_window_energy(media.repartition(7), decoder="fake").collect(),
        )
    )
    assert a == b
    assert len(a) == 20 * 4
    assert all(e >= 0 for *_, e in a)


def test_audio_stub_raises(spark):
    import pytest
    from pyspark.sql import functions as F

    from osmgraft.operators.multimodal import audio_window_energy

    media = spark.range(1).select(
        F.lit("c").alias("media_id"), F.encode(F.lit("x"), "utf-8").alias("bytes")
    )
    with pytest.raises(Exception):
        audio_window_energy(media, decoder="stub").collect()


def test_cosine_topk_np_matches_hof(spark):
    from pyspark.sql import functions as F

    from osmgraft.operators.similarity import cosine_topk, cosine_topk_np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, cosine_topk(emb, q, 10).collect()))
    b = sorted(map(tuple, cosine_topk_np(emb, q, 10).collect()))
    assert a == b


def test_cosine_topk_blocked_matches_unblocked(spark):
    """Block-broadcast nested loop is a physical rewrite only: identical
    (query_id, neighbor_id, rank) sets to the single-broadcast fast path,
    regardless of block boundaries."""
    from osmgraft.operators.similarity import cosine_topk_blocked, cosine_topk_np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 30).cache()
    base = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_np(emb, q, k=7).collect()}
    for block_rows in (7, 16, 1000):  # 5 blocks, 2 blocks, single-block fast path
        got = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in cosine_topk_blocked(emb, q, k=7, block_rows=block_rows).collect()
        }
        assert got == base, block_rows


def test_cosine_neardup_pairs_exact(spark, emb):
    """Block-broadcast near-dup pairs equal numpy all-pairs truth at any block
    size, each unordered pair exactly once, planted near-dup found."""
    from osmgraft.operators.similarity import cosine_neardup_pairs

    rows = emb.orderBy("vec_id").collect()
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    thr = 0.5
    truth = {
        (i, j)
        for i in range(len(m))
        for j in range(i + 1, len(m))
        if sims[i, j] >= thr
    }
    assert (0, 1) in truth  # planted near-dup pair
    for block_rows in (23, 1000):
        got = [
            (r.id_a, r.id_b)
            for r in cosine_neardup_pairs(emb, thr, block_rows=block_rows).collect()
        ]
        assert len(got) == len(set(got))  # once per pair
        assert set(got) == truth, block_rows


def test_cosine_topk_blocked_empty_block(spark, emb):
    """block_rows=1 makes empty hash blocks near-certain; they must be
    skipped, not crash query normalization (review finding)."""
    from osmgraft.operators.similarity import cosine_topk_blocked, cosine_topk_np

    q = emb.filter(F.col("vec_id") < 4).cache()
    base = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_np(emb, q, k=3).collect()}
    got = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in cosine_topk_blocked(emb, q, k=3, block_rows=1).collect()
    }
    assert got == base


def test_similarity_column_order_independent(spark, emb):
    """Kernels read the (id, vec) projection, not positional columns of the
    caller's schema (review finding: swapped/extra columns gave garbage)."""
    from osmgraft.operators.similarity import cosine_neardup_pairs, cosine_topk_np

    reordered = emb.select(F.lit("x").alias("junk"), "embedding", "vec_id")
    q = emb.filter(F.col("vec_id") < 3)
    want = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_np(emb, q, k=3).collect()}
    got = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk_np(reordered, q, k=3).collect()}
    assert got == want
    wantp = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(emb, 0.5).collect()}
    gotp = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(reordered, 0.5).collect()}
    assert gotp == wantp and (0, 1) in gotp


def test_wav_pcm16_roundtrip_and_energy(spark):
    """Real RIFF/PCM16 decode (round 3): container roundtrip is exact and
    window energies match a straight numpy computation."""
    import numpy as np

    from osmgraft.operators.multimodal import (
        audio_window_energy,
        encode_wav_pcm16,
        wav_pcm16,
    )

    rng = np.random.default_rng(9)
    clips = [rng.integers(-(2**15), 2**15, 1024).astype(np.int16) for _ in range(5)]
    assert all((wav_pcm16(encode_wav_pcm16(c)) == c).all() for c in clips)
    media = spark.createDataFrame(
        [(f"m{i}", bytearray(encode_wav_pcm16(c))) for i, c in enumerate(clips)],
        "media_id string, bytes binary",
    )
    got = {
        (r.media_id, r.window_idx): r.energy
        for r in audio_window_energy(media, window=256, decoder="wav").collect()
    }
    assert len(got) == 5 * 4
    for i, c in enumerate(clips):
        for k in range(4):
            seg = c[k * 256:(k + 1) * 256].astype(np.int64)
            assert got[(f"m{i}", k)] == int((seg * seg).sum())
    # partitioning invariance (flat-buffer fast path vs per-row fallback mix)
    again = {
        (r.media_id, r.window_idx): r.energy
        for r in audio_window_energy(
            media.repartition(4), window=256, decoder="wav"
        ).collect()
    }
    assert again == got


def test_wav_non_canonical_header_and_errors(spark):
    """Foreign WAVs (extra chunk before data) take the per-row parser;
    non-PCM and truncated payloads raise loudly."""
    import struct

    import numpy as np
    import pytest

    from osmgraft.operators.multimodal import (
        audio_window_energy,
        encode_wav_pcm16,
        wav_pcm16,
    )

    pcm = np.arange(512, dtype=np.int16)
    canonical = encode_wav_pcm16(pcm)
    # splice a LIST chunk between fmt and data -> non-44-byte header
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    foreign = canonical[:36] + extra + canonical[36:]
    foreign = b"RIFF" + struct.pack("<I", len(foreign) - 8) + foreign[8:]
    assert (wav_pcm16(foreign) == pcm).all()
    media = spark.createDataFrame(
        [("a", bytearray(canonical)), ("b", bytearray(foreign))],
        "media_id string, bytes binary",
    )
    rows = audio_window_energy(media, window=256, decoder="wav").collect()
    assert len(rows) == 4  # two full windows per clip
    by = {(r.media_id, r.window_idx): r.energy for r in rows}
    assert by[("a", 0)] == by[("b", 0)]
    with pytest.raises(ValueError, match="PCM16 only"):
        ieee = bytearray(canonical)
        struct.pack_into("<H", ieee, 20, 3)  # IEEE float format tag
        wav_pcm16(bytes(ieee))
    with pytest.raises(ValueError):
        wav_pcm16(canonical[:40])


def test_phash_multiprobe_equals_baseline(spark):
    """probe_flips>0 must return EXACTLY the q=0 pair set (recall 1.0 by
    pigeonhole, precision 1.0 by the exact popcount verify) at radius 8."""
    from pyspark.sql import functions as F

    from osmgraft.operators.multimodal import phash_near_dup_pairs

    base = spark.range(800).select(
        F.col("id").cast("string").alias("image_id"),
        F.xxhash64(F.col("id")).alias("phash"),
    )
    # planted pairs at hamming 1, 7, 8 (in-radius) and 9 (out)
    plant = spark.createDataFrame(
        [("p1a", 100), ("p1b", 100 ^ (1 << 3)),
         ("p7a", 999), ("p7b", 999 ^ 0x7F),
         ("p8a", -5000), ("p8b", -5000 ^ 0xFF),
         ("p9a", 777), ("p9b", 777 ^ 0x1FF)],
        "image_id string, phash long",
    )
    df = base.unionByName(plant)
    a = sorted(map(tuple, phash_near_dup_pairs(df, max_hamming=8, probe_flips=0).collect()))
    b = sorted(map(tuple, phash_near_dup_pairs(df, max_hamming=8, probe_flips=2).collect()))
    assert a == b
    got = {(x, y) for x, y, _ in a}
    assert {("p1a", "p1b"), ("p7a", "p7b"), ("p8a", "p8b")} <= got
    assert ("p9a", "p9b") not in got


def test_connected_components_chain_and_clusters(spark):
    """Min-label propagation over a 5-node chain (needs multiple rounds),
    a triangle, and an isolated pair — vs a local union-find twin."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    from osmgraft.operators.dedup import connected_components

    got = {r.id: r.comp for r in connected_components(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_repetition_kernels_hand_computed(spark):
    """top_token_count / word_bigrams on crafted rows (Gopher-rule primitives)."""
    from osmgraft.functions import text as T

    rows = [(1, "a a a b"), (2, ""), (3, "x"), (4, "  spaced   out  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = df.withColumn("toks", T.tokens(F.col("text")))
    got = {
        r.doc_id: (r.top, list(r.bgs))
        for r in t.select(
            "doc_id",
            T.top_token_count(F.col("toks")).alias("top"),
            T.word_bigrams(F.col("toks")).alias("bgs"),
        ).collect()
    }
    assert got[1] == (3, ["a a", "a a", "a b"])
    assert got[2] == (0, [])
    assert got[3] == (1, [])
    assert got[4] == (1, ["spaced out"])


def test_pack_sequences_matches_reference_and_partition_invariant(spark):
    """Two-pass distributed prefix scan == local python reference; output is a
    pure function of the global md5 order (invariant to num_parts)."""
    import hashlib

    from osmgraft.operators.packing import pack_sequences

    rows = [(i, "tok " * (i % 37)) for i in range(1, 201)]  # includes 0-token docs
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    S = 16
    got = {r.doc_id: (r.n_tok, r.first_seq, r.last_seq, r.seq_offset)
           for r in pack_sequences(docs, seq_len=S, num_parts=5).collect()}

    def okey(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    order = sorted(((okey(i), i) for i, txt in rows if i % 37 > 0))
    cum, ref = 0, {}
    for _, i in order:
        n = i % 37
        ref[i] = (n, cum // S, (cum + n - 1) // S, cum % S)
        cum += n
    assert got == ref
    again = {r.doc_id: (r.n_tok, r.first_seq, r.last_seq, r.seq_offset)
             for r in pack_sequences(docs, seq_len=S, num_parts=1).collect()}
    assert again == got


# --- content-defined chunking -------------------------------------------------


def test_cdc_chunks_reassemble(spark):
    """Chunks concatenated in chunk_idx order have the original length, and
    every chunk hash matches an independent scalar recompute."""
    import hashlib

    from osmgraft.operators.dedup import CDC_MASK, CDC_W, cdc_chunks

    texts = {
        1: "the quick brown fox jumps over the lazy dog " * 8,
        2: "short",
        3: "",
        4: "x" * (CDC_W - 1),  # below window size: single chunk, no boundaries
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    rows = sorted(
        cdc_chunks(docs).collect(), key=lambda r: (r.doc_id, r.chunk_idx)
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # empty doc: no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0].chunk_len == 5
    assert len(by_doc[4]) == 1 and by_doc[4][0].chunk_len == CDC_W - 1
    for d, text in texts.items():
        if not text:
            continue
        assert sum(r.chunk_len for r in by_doc[d]) == len(text)

    # independent scalar recompute of doc 1's boundary spec
    t = texts[1]

    def md5_long(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    bounds = [
        i
        for i in range(CDC_W, len(t) + 1)
        if md5_long(t[i - CDC_W : i]) % CDC_MASK == 0 and i < len(t)
    ]
    cuts = [0] + bounds + [len(t)]
    expect = [t[a:b] for a, b in zip(cuts, cuts[1:]) if b > a]
    got = by_doc[1]
    assert len(got) == len(expect)
    for r, chunk in zip(got, expect):
        assert (r.chunk_len, r.chunk_hash) == (len(chunk), md5_long(chunk))


def test_cdc_self_synchronizes_after_edit(spark):
    """The CDC property that makes it dedup: an edit near the front only
    disturbs chunks overlapping the edit window; later chunk hashes realign."""
    from osmgraft.operators.dedup import cdc_chunks

    # varied text (periodic text has too few distinct windows to cut)
    rng = np.random.default_rng(4)
    base = " ".join(f"w{v}" for v in rng.integers(0, 10_000, 300))
    edited = "XY" + base  # 2-char insertion at the very front
    docs = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id long, text string"
    )
    rows = cdc_chunks(docs).collect()
    h1 = {r.chunk_hash for r in rows if r.doc_id == 1}
    h2 = {r.chunk_hash for r in rows if r.doc_id == 2}
    assert len(h1) > 3  # enough chunks for the property to be meaningful
    shared = len(h1 & h2)
    assert shared >= len(h1) - 2  # all but the chunk(s) touching the edit


def test_cdc_shared_chunks_report(spark):
    from osmgraft.operators.dedup import cdc_shared_chunks

    rng = np.random.default_rng(9)
    para = " ".join(f"t{v}" for v in rng.integers(0, 10_000, 120))
    docs = spark.createDataFrame(
        [
            (1, "intro one " + para),
            (2, "different intro " + para + " and an outro"),
            (3, para),
            (4, "nothing in common with anything else here at all"),
        ],
        "doc_id long, text string",
    )
    got = cdc_shared_chunks(docs).collect()
    assert len(got) >= 1  # the paragraph's interior chunks are shared
    assert all(r.n_docs >= 2 for r in got)
    assert all(r.n_occurrences >= r.n_docs for r in got)


# --- PII scrubbing --------------------------------------------------------------


def test_pii_scrub_semantics(spark):
    from osmgraft.functions.text import pii_counts, pii_scrub

    rows = [
        (1, "reach me at jane.doe+spam@mail.example.org or bob@x.io thanks"),
        (2, "server 192.168.1.254 called 212-555-7788 twice"),
        (3, "no pii here at all"),
        (4, "edge: not-an-email@ and 999.999.999.999 and 12-345-6789"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    c = pii_counts(F.col("text"))
    got = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            c["email"].alias("e"),
            c["ipv4"].alias("i"),
            c["phone"].alias("p"),
            pii_scrub(F.col("text")).alias("s"),
        ).collect()
    }
    assert (got[1].e, got[1].i, got[1].p) == (2, 0, 0)
    assert got[1].s == "reach me at <EMAIL> or <EMAIL> thanks"
    assert (got[2].e, got[2].i, got[2].p) == (0, 1, 1)
    assert got[2].s == "server <IPV4> called <PHONE> twice"
    assert (got[3].e, got[3].i, got[3].p) == (0, 0, 0)
    assert got[3].s == rows[2][1]
    # conservative patterns: the dotted quad matches (no 0-255 range check,
    # documented), '@ ' and a 2-3-4 digit grouping do not
    assert (got[4].e, got[4].i, got[4].p) == (0, 1, 0)


# --- BPE pre-tokenization --------------------------------------------------------


def test_bpe_pretokens_split(spark):
    from osmgraft.functions.text import bpe_pretokens

    rows = [
        (1, "I'll we've don't it's"),
        (2, "abc123 def,ghi!!  x"),
        (3, "naïve café ßtraße"),      # unicode letters in \p{L}
        (4, "price: $1,234.56"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r.t
        for r in df.select("doc_id", bpe_pretokens(F.col("text")).alias("t")).collect()
    }
    assert got[1] == ["I", "'ll", " we", "'ve", " don", "'t", " it", "'s"]
    # no-lookahead variant: "\s+" eats the full run, so "x" has no space prefix
    assert got[2] == ["abc", "123", " def", ",", "ghi", "!!", "  ", "x"]
    assert got[3] == ["naïve", " café", " ßtraße"]
    assert got[4] == ["price", ":", " $", "1", ",", "234", ".", "56"]
    assert got[5] == []
    # lossless split: concatenation reproduces the input
    for i, text in rows:
        assert "".join(got[i]) == text


def test_bpe_pretokens_duckdb_agreement(spark):
    """Java regex and RE2 produce the IDENTICAL split on branch-exercising
    text (alternation preference, unicode classes, whitespace folding)."""
    import duckdb

    from osmgraft.functions.text import bpe_pretokens, sql_bpe_pretokens

    texts = [
        "I'll we've don't it's abc123 def,ghi!!  x",
        "naïve café ßtraße — em–dash… 'quoted' \"double\"",
        "tabs\tand\nnewlines  mixed   runs",
        "ends with spaces   ",
        "'s't're've'm'll'd",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    got = {
        r.i: r.t
        for r in df.select("i", bpe_pretokens(F.col("text")).alias("t")).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        ref = con.execute(
            f"SELECT {sql_bpe_pretokens('?')}", [t]
        ).fetchone()[0]
        assert got[i] == ref, (i, got[i], ref)


# --- image augmentation ----------------------------------------------------------


def test_image_augment_semantics(spark):
    """Each op is the exact numpy permutation; rotations swap (w, h)."""
    from osmgraft.functions.codec import decode_image
    from osmgraft.operators.multimodal import image_augment
    from osmgraft.synth import synth_images, _pixels_for

    imgs = synth_images(spark, 10).filter(F.col("fmt").isin("raw", "ppm", "png"))
    src = {r.image_id: r for r in imgs.collect()}
    for op, f in [
        ("hflip", lambda p: p[:, ::-1]),
        ("vflip", lambda p: p[::-1, :]),
        ("rot90", lambda p: np.rot90(p, 1)),
        ("rot270", lambda p: np.rot90(p, 3)),
        ("transpose", lambda p: p.transpose(1, 0, 2)),
    ]:
        got = {r.image_id: r for r in image_augment(imgs, op).collect()}
        for iid, s in src.items():
            px = decode_image(bytes(s.bytes), s.w, s.h, s.fmt)
            expect = f(px)
            g = got[iid]
            assert (g.w, g.h) == (expect.shape[1], expect.shape[0]), (op, iid)
            out = decode_image(bytes(g.bytes), g.w, g.h, g.fmt)
            assert np.array_equal(out, expect), (op, iid)
            assert g.caption == s.caption


def test_image_augment_involutions(spark):
    """hflip^2 = vflip^2 = transpose^2 = rot90^4 = id, bitwise on pixels."""
    from osmgraft.functions.codec import decode_image
    from osmgraft.operators.multimodal import image_augment
    from osmgraft.synth import synth_images

    imgs = synth_images(spark, 10).filter(F.col("fmt").isin("raw", "ppm", "png"))
    src = {
        r.image_id: decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
        for r in imgs.collect()
    }
    for chain in (["hflip"] * 2, ["vflip"] * 2, ["transpose"] * 2, ["rot90"] * 4,
                  ["rot180", "rot180"], ["rot90", "rot270"]):
        df = imgs
        for op in chain:
            df = image_augment(df, op)
        for r in df.collect():
            out = decode_image(bytes(r.bytes), r.w, r.h, r.fmt)
            assert np.array_equal(out, src[r.image_id]), chain


def test_ngrams_semantics(spark):
    """ngrams: exact windows, whitespace-run tolerance, and the short-text
    guard (Spark's sequence() DESCENDS when stop < start — a doc shorter
    than n must yield [], not phantom reversed windows)."""
    from osmgraft.functions.text import ngrams

    df = spark.createDataFrame(
        [(1, "a b  c d"), (2, "a b"), (3, ""), (4, None), (5, "x y z")],
        "id long, t string",
    )
    got = {
        r.id: r.g
        for r in df.select("id", ngrams(F.col("t"), 3).alias("g")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == [] and got[3] == []
    assert got[4] == []  # null text -> no tokens -> empty, not null row blowup
    assert got[5] == ["x y z"]


def test_ngrams_duckdb_agreement(spark):
    """sql_ngrams produces the identical gram lists (slicing/range duality)."""
    import duckdb

    from osmgraft.functions.text import ngrams, sql_ngrams

    texts = ["a b c d e f", "one two", "  pad   runs\tand tabs x ", "q w e r"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    for n in (2, 3, 5):
        got = {
            r.id: r.g
            for r in df.select("id", ngrams(F.col("t"), n).alias("g")).collect()
        }
        con = duckdb.connect()
        rows = con.execute(
            f"SELECT i, {sql_ngrams('t', n)} FROM (SELECT unnest(?) , unnest(?)) s(i, t)",
            [list(range(len(texts))), texts],
        ).fetchall()
        want = {r[0]: r[1] for r in rows}
        assert got == want, f"n={n}"


def test_dedup_clusters_chain_transitivity(spark):
    """A-B and B-C verified pairs close into ONE cluster with min-id survivor
    even when A-C alone is below threshold (dedup-by-components semantics)."""
    from osmgraft.operators.dedup import dedup_clusters, minhash_lsh_pairs

    mid = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (10, "one two three " + mid),            # A: shares mid with B
            (11, mid + " four five six"),             # B: shares mid with A and C
            (12, "seven eight " + mid + " nine ten"),  # C
            (99, "totally different words entirely unrelated content here"),
        ],
        "doc_id long, text string",
    )
    pair_keys = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.4).collect()
    }
    assert (10, 11) in pair_keys and (11, 12) in pair_keys
    got = {r.doc_id: (r.cluster_id, r.is_survivor)
           for r in dedup_clusters(docs, jaccard_threshold=0.4).collect()}
    assert got[10] == (10, True)
    assert got[11] == (10, False) and got[12] == (10, False)
    assert 99 not in got  # unpaired docs stay out of the kill list


def test_mixture_sample_budget_and_determinism(spark):
    """Greedy fill never exceeds the budget, takes docs in hash order, and
    is invariant to input partitioning."""
    from osmgraft.functions.text import md5_long
    from osmgraft.operators.packing import mixture_sample

    rows = [(i, "s" + str(i % 2), "w " * (5 + i % 7)) for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    from osmgraft.functions.text import token_count

    def run(df):
        out = mixture_sample(
            df, "source", F.lit(30), token_count(F.col("text")),
            md5_long(F.col("doc_id").cast("string")),
        )
        return sorted((r.doc_id, r.cum_tok) for r in out.collect())

    a = run(docs)
    b = run(docs.repartition(13))
    assert a == b and len(a) > 0
    # per-source cum_tok maxima respect the budget
    import collections
    by_src = collections.defaultdict(int)
    out = mixture_sample(
        docs, "source", F.lit(30), token_count(F.col("text")),
        md5_long(F.col("doc_id").cast("string")),
    ).collect()
    for r in out:
        by_src[r.source] = max(by_src[r.source], r.cum_tok)
    assert all(v <= 30 for v in by_src.values()) and len(by_src) == 2


def test_proportional_quotas_hamilton(spark):
    """Σ quota == budget exactly; each quota within 1 of the real share;
    leftover seats go to the largest fractional parts."""
    from osmgraft.operators.packing import proportional_quotas

    counts = spark.createDataFrame(
        [("a", 3), ("b", 3), ("c", 4)], "g string, n long"
    )
    # budget 7, N=10: shares 2.1, 2.1, 2.8 -> bases 2,2,2; leftover 1 seat
    # to the largest frac (.8 -> c)
    q = {r["g"]: r["quota"] for r in proportional_quotas(counts, 7).collect()}
    assert q == {"a": 2, "b": 2, "c": 3}
    assert sum(q.values()) == 7
    # frac tie: budget 5, counts 1,1 -> bases 2,2; 1 seat, tie broken to the
    # smaller group key
    counts2 = spark.createDataFrame([("x", 1), ("y", 1)], "g string, n long")
    q2 = {r["g"]: r["quota"] for r in proportional_quotas(counts2, 5).collect()}
    assert q2 == {"x": 3, "y": 2}


def test_proportional_quotas_sql_twin(spark):
    import duckdb

    from osmgraft.operators.packing import proportional_quotas, sql_proportional_quotas

    counts = [("s%d" % i, (i * 7) % 13 + 1) for i in range(9)]
    df = spark.createDataFrame(counts, "g string, n long")
    got = {r["g"]: r["quota"] for r in proportional_quotas(df, 41).collect()}
    values = ", ".join(f"('{g}', {n})" for g, n in counts)
    con = duckdb.connect()  # keep a reference: .sql() is lazy
    duck = con.sql(
        sql_proportional_quotas(
            f"SELECT g, n FROM (VALUES {values}) v(g, n)", 41, "g"
        )
    ).fetchall()
    assert {g: q for g, _, q in duck} == got
    assert sum(got.values()) == 41


# --- compaction planner -----------------------------------------------------


def test_compaction_plan_semantics(spark):
    """Hand-checked: sizes [5,4,3,2,1] target 6 within one partition →
    exclusive cumsums [0,5,9,12,14] → bins [0,0,1,2,2]."""
    from osmgraft.operators.packing import compaction_plan

    df = spark.createDataFrame(
        [("p", i, b) for i, b in enumerate([5, 4, 3, 2, 1])],
        "part string, file_id int, bytes int",
    )
    got = {
        r["bin"]: (r["n_files"], r["bin_bytes"])
        for r in compaction_plan(df, 6, ["part"]).collect()
    }
    assert got == {0: (2, 9), 1: (1, 3), 2: (2, 3)}


def test_compaction_plan_laws(spark):
    """Conservation: Σ bin_bytes == Σ input bytes and Σ n_files == n. Bins
    except the last (per partition) reach ≥ target once seeded (next-fit:
    a bin closes only when the running fill crosses its boundary).
    Oversized files occupy a bin alone seeded at their own prefix."""
    from osmgraft.operators.packing import compaction_plan

    rows = [("a", i, (i * 37) % 900 + 10) for i in range(200)] + [
        ("b", i, 5000) for i in range(3)  # each larger than target
    ]
    df = spark.createDataFrame(rows, "part string, file_id int, bytes int")
    plan = compaction_plan(df, 1024, ["part"]).collect()
    assert sum(r["n_files"] for r in plan) == 203
    assert sum(r["bin_bytes"] for r in plan) == sum(b for _, _, b in rows)
    b_bins = [r for r in plan if r["part"] == "b"]
    assert len(b_bins) == 3 and all(r["n_files"] == 1 for r in b_bins)


def test_compaction_plan_parallelism_invariant(spark):
    from osmgraft.operators.packing import compaction_plan

    rows = [("p%d" % (i % 7), i, (i * 61) % 3000 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "part string, file_id int, bytes int")
    r1 = sorted(map(tuple, compaction_plan(df.coalesce(1), 2048, ["part"]).collect()))
    r32 = sorted(map(tuple, compaction_plan(df.repartition(32), 2048, ["part"]).collect()))
    assert r1 == r32


def test_phash_neardup_key_cols_restrict_and_keep_recall(spark):
    """key_cols semantics: a 1-bit pair in the SAME key group is found
    (pigeonhole recall holds within groups); the identical hash pair split
    across groups is dropped."""
    from osmgraft.operators.multimodal import phash_near_dup_pairs

    rows = [
        (0, 0b1010101, 5),   # group 5: 0 and 1 are 1 bit apart
        (1, 0b1010100, 5),
        (2, 0b1010101, 9),   # same hashes, different group: must NOT pair
        (3, 0b1010100, 8),
        (4, 0b1111111110000000, 5),  # far from everything
    ]
    df = spark.createDataFrame(rows, "image_id long, phash long, g int")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_dup_pairs(df, max_hamming=2, key_cols=["g"]).collect()
    )
    # (2,3) is hamming-1 but in different groups (9 vs 8) → excluded
    assert got == [(0, 1, 1)]


# --- levenshtein near-dup join (pigeonhole segments) ---------------------------
def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        cur = [i] + [0] * len(b)
        for j in range(1, len(b) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[-1]


def test_levenshtein_neardup_brute_force(spark):
    """Pigeonhole candidates + exact verify == brute force over an
    adversarial mix: tiny strings (0..12 chars, alphabet 'ab' — maximal
    segment collisions and the tiny all-pairs stratum) plus longer strings
    with planted 2-edit variants (substitution + deletion)."""
    import random

    from osmgraft.operators.dedup import levenshtein_neardup_pairs

    rng = random.Random(7)
    rows = [(i, "".join(rng.choice("ab") for _ in range(rng.randint(0, 12))))
            for i in range(60)]
    for i in range(60, 80):
        s = "".join(rng.choice("abcdefgh ") for _ in range(rng.randint(20, 40)))
        rows.append((i, s))
        t = list(s)
        t[5] = "~"
        del t[11]
        rows.append((i + 1000, "".join(t)))

    want = sorted(
        (a, b, _lev(ta, tb))
        for (a, ta) in rows for (b, tb) in rows
        if a < b and _lev(ta, tb) <= 2
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, levenshtein_neardup_pairs(df, k=2).collect()))
    assert got == want
    assert any(d == 2 for _, _, d in want)  # planted edits actually exercised
    assert all(a < b for a, b, _ in got)  # one row per unordered pair


def test_levenshtein_neardup_k1_and_length_gap(spark):
    """k=1 tightens the gate; pairs with |len diff| > k can never appear."""
    from osmgraft.operators.dedup import levenshtein_neardup_pairs

    rows = [(0, "hello world"), (1, "hello worlds"), (2, "hello w0rld"),
            (3, "hello"), (4, ""), (5, "x")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(map(tuple, levenshtein_neardup_pairs(df, k=1).collect()))
    assert got == [(0, 1, 1), (0, 2, 1), (4, 5, 1)]


def test_video_scene_cuts_planted(spark):
    """A clip of two constant-luma halves has delta 0 everywhere except the
    planted boundary; the threshold flag is exact at the cross-multiplied
    boundary (strict >)."""
    import numpy as np

    from osmgraft.operators.multimodal import encode_y4m, video_scene_cuts

    luma = np.zeros((6, 4, 4), np.uint8)
    luma[3:] = 200  # hard cut between f=2 and f=3: delta = 200*16 = 3200
    flat = np.full((3, 4, 4), 7, np.uint8)  # no cuts at all
    df = spark.createDataFrame(
        [("cut", bytearray(encode_y4m(luma, "mono"))),
         ("flat", bytearray(encode_y4m(flat, "mono")))],
        "media_id string, bytes binary",
    )
    # thr mean=200 exactly: 1000*3200 == 200000*16 -> strict > means False
    rows = {}
    for r in video_scene_cuts(df, thr_permille=200000).collect():
        rows.setdefault(r["media_id"], {})[r["f"]] = (r["delta"], r["cut"])
    assert rows["cut"] == {1: (0, False), 2: (0, False), 3: (3200, False),
                           4: (0, False), 5: (0, False)}
    assert rows["flat"] == {1: (0, False), 2: (0, False)}
    rows2 = {}
    for r in video_scene_cuts(df, thr_permille=199999).collect():
        rows2.setdefault(r["media_id"], {})[r["f"]] = r["cut"]
    assert rows2["cut"] == {1: False, 2: False, 3: True, 4: False, 5: False}


def test_span_corruption_reference_and_laws(spark):
    """Masks == a hashlib reference (anchor rank -> clamp -> overlap merge);
    spans are disjoint, within bounds, and invariant under repartition."""
    import hashlib

    from osmgraft.operators.packing import span_corruption

    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 40))) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in span_corruption(df).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_masked"])
        )
    got = {k: sorted(v) for k, v in got.items()}

    want = {}
    for i, text in rows:
        n = len(text.split())
        n_spans = (n * 15) // (100 * 3)
        if n_spans < 1:
            continue
        hs = sorted(
            (int(hashlib.md5(f"{i}:{p}".encode()).hexdigest()[:15], 16), p)
            for p in range(n)
        )
        anchors = sorted(p for _, p in hs[:n_spans])
        merged = []
        for p in anchors:
            s, e = p, min(p + 2, n - 1)
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        want[i] = [(s, e, e - s + 1) for s, e in merged]
    assert got == want
    assert any(len(v) > 1 for v in want.values())
    for i, spans in got.items():
        n = len(rows[i][1].split())
        prev_end = -1
        for s, e, m in spans:
            assert 0 <= s <= e < n and m == e - s + 1
            assert s > prev_end  # disjoint after merging
            prev_end = e
    rep = {}
    for r in span_corruption(df.repartition(7)).collect():
        rep.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["n_masked"])
        )
    assert {k: sorted(v) for k, v in rep.items()} == got


def test_jaccard_prefix_equals_inverted_index(spark):
    """PPJoin prefix filtering returns EXACTLY the inverted-index op's
    pairs at several thresholds, on data with hot stop-shingles (the
    prefix filter's adversarial case), and with fewer candidates."""
    import random

    from osmgraft.operators.dedup import jaccard_ngram_pairs, jaccard_prefix_pairs

    rng = random.Random(3)
    vocab = [f"w{j}" for j in range(40)]
    rows = []
    for i in range(40):
        toks = ["the", "of", "and"] + [vocab[rng.randrange(40)] for _ in range(12)]
        rows.append((i, " ".join(toks)))
        if i % 4 == 0:  # tight near-dup (one appended token, J = n/(n+1))
            rows.append((i + 500, " ".join(toks + ["zzz"])))
        if i % 4 == 1:  # looser near-dup (one substituted token)
            toks2 = list(toks)
            toks2[7] = "zzz"
            rows.append((i + 500, " ".join(toks2)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for tau in (0.5, 0.8):
        full = sorted(map(tuple, jaccard_ngram_pairs(df, tau).collect()))
        pref = sorted(map(tuple, jaccard_prefix_pairs(df, tau).collect()))
        assert pref == full and len(full) > 0, tau


def test_duplicate_substring_spans_planted(spark):
    from osmgraft.operators.dedup import duplicate_substring_spans

    shared = "XYZQWJKVBNMPLOIUHGT_SHARED_BOILERPLATE_RUN_0123456789"  # 53 chars
    uniq_a = "aaaaaabbbbbbccccccddddddeeeeeeffffffgggggghhhhhh"
    uniq_b = "iiiiiijjjjjjkkkkkkllllllmmmmmmnnnnnnooooooppppppqq"
    rows = [
        (1, uniq_a + shared + "tail_one_unique_suffix_abcdef"),
        (2, "head_two_unique_prefix_zzzzz" + shared + uniq_b),
        (3, "totally unrelated text with no repeats of that length at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_substring_spans(docs, gram_len=24).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # docs 1 and 2 each get exactly one span covering the planted block
    assert set(by_doc) == {1, 2}
    for did, text in [(1, rows[0][1]), (2, rows[1][1])]:
        r = by_doc[did]
        s = text[r["span_start"]:r["span_end"]]
        assert shared in s, (did, s)
        assert r["span_len"] == r["span_end"] - r["span_start"]
        # span must not stretch into provably-unique territory by more than
        # gram_len-1 chars on each side (positions whose gram overlaps the block)
        assert r["span_len"] < len(shared) + 2 * 24


def test_duplicate_substring_spans_no_dups_empty(spark):
    from osmgraft.operators.dedup import duplicate_substring_spans

    docs = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789"), (2, "ZYXWVUTSRQPONMLKJIHGFEDCBA_9876543210")],
        "doc_id long, text string",
    )
    assert duplicate_substring_spans(docs, gram_len=24).count() == 0


def test_audio_active_segments_crafted(spark):
    """Crafted PCM: loud block / silence / loud block -> exactly two
    segments with hand-computed energies; all-silent clip -> no rows."""
    import numpy as np

    from osmgraft.operators.multimodal import audio_active_segments, encode_wav_pcm16

    w = 4
    loud, quiet = 1000, 1
    pcm1 = np.array(
        [loud] * (2 * w) + [quiet] * (3 * w) + [loud] * w, dtype=np.int16
    )
    pcm2 = np.array([quiet] * (6 * w), dtype=np.int16)
    df = spark.createDataFrame(
        [("a", bytearray(encode_wav_pcm16(pcm1))),
         ("b", bytearray(encode_wav_pcm16(pcm2)))],
        "media_id string, bytes binary",
    )
    thresh = w * loud * loud // 2
    out = audio_active_segments(df, window=w, energy_thresh=thresh).collect()
    segs = sorted((r["seg_start"], r["seg_end"], r["n_windows"], r["energy_sum"])
                  for r in out)
    assert all(r["media_id"] == "a" for r in out)
    e = w * loud * loud
    assert segs == [(0, 2, 2, 2 * e), (5, 6, 1, e)]


def test_video_temporal_signature_crafted(spark):
    """Hand-built y4m clips: monotone-brighter -> all bits set; monotone-
    darker -> zero; a shifted copy (global +10 luma) keeps the signature
    (offset invariance)."""
    import numpy as np

    from osmgraft.operators.multimodal import encode_y4m, video_temporal_signature

    up = np.stack([np.full((4, 4), 10 * (f + 1), np.uint8) for f in range(4)])
    down = up[::-1].copy()
    up_shift = np.clip(up.astype(np.int32) + 10, 0, 255).astype(np.uint8)
    rows = [
        ("up", bytearray(encode_y4m(up))),
        ("down", bytearray(encode_y4m(down))),
        ("up_shift", bytearray(encode_y4m(up_shift))),
    ]
    df = spark.createDataFrame(rows, "media_id string, bytes binary")
    out = {r["media_id"]: (r["n_frames"], r["sig"])
           for r in video_temporal_signature(df).collect()}
    assert out["up"] == (4, 0b111)
    assert out["down"] == (4, 0)
    assert out["up_shift"] == out["up"]


def test_video_temporal_signature_long_clip_truncates(spark):
    """Clips past 64 frames must not hit undefined int64 shifts: the sig
    uses the first 63 diffs only, and a 100-frame clip equals its own
    first-64-frame prefix."""
    import numpy as np

    from osmgraft.operators.multimodal import encode_y4m, video_temporal_signature

    rng = np.random.default_rng(11)
    frames = rng.integers(0, 256, (100, 4, 4)).astype(np.uint8)
    df = spark.createDataFrame(
        [("full", bytearray(encode_y4m(frames))),
         ("head", bytearray(encode_y4m(frames[:64])))],
        "media_id string, bytes binary",
    )
    out = {r["media_id"]: r for r in video_temporal_signature(df).collect()}
    assert out["full"]["sig"] == out["head"]["sig"]
    assert 0 <= out["full"]["sig"] < 2 ** 63
    assert out["full"]["n_frames"] == 100


def test_audio_active_segments_custom_id_col(spark):
    import numpy as np

    from osmgraft.operators.multimodal import audio_active_segments, encode_wav_pcm16

    pcm = np.array([1000] * 8, dtype=np.int16)
    df = spark.createDataFrame(
        [("c1", bytearray(encode_wav_pcm16(pcm)))], "clip_id string, bytes binary"
    )
    out = audio_active_segments(df, window=4, energy_thresh=1, id_col="clip_id").collect()
    assert [r["clip_id"] for r in out] == ["c1"]


def test_containment_asymmetric_excerpt(spark):
    """A short excerpt inside a long page: containment(excerpt -> page)
    fires while symmetric Jaccard at the same threshold does not; the
    reverse direction (page -> excerpt) must NOT fire."""
    from osmgraft.operators.dedup import containment_pairs, jaccard_ngram_pairs

    page = " ".join(f"tok{i}" for i in range(60))
    excerpt = " ".join(f"tok{i}" for i in range(10, 20))
    docs = spark.createDataFrame(
        [(1, page), (2, excerpt), (3, "completely different words here entirely")],
        "doc_id long, text string",
    )
    cont = {(r["doc_a"], r["doc_b"])
            for r in containment_pairs(docs, 0.8).collect()}
    assert (2, 1) in cont and (1, 2) not in cont
    jac = jaccard_ngram_pairs(docs, 0.8).collect()
    assert not any({r["doc_a"], r["doc_b"]} == {1, 2} for r in jac)


def test_audio_fingerprint_shift_invariance_and_recall(spark):
    """Every planted window-aligned shifted pair is recovered (recall 1.0 on
    the fixture groups — shift invariance of position-free triple keys), and
    pair counts per group are the structural 2-3 shared keys; candidates
    across groups stay rare (<1% of cross pairs)."""
    from osmgraft.operators.multimodal import audio_fingerprint_pairs
    from osmgraft.synth import synth_audio_shifted

    n = 60  # 20 groups of 3
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in audio_fingerprint_pairs(synth_audio_shifted(spark, n)).collect()
    }
    true_pairs = [
        (f"aud{a:09d}", f"aud{b:09d}")
        for g in range(n // 3)
        for a in (3 * g, 3 * g + 1)
        for b in range(a + 1, 3 * g + 3)
    ]
    for p in true_pairs:
        assert p in pairs, f"planted pair {p} missed"
        assert pairs[p] >= 1
    n_false = len(pairs) - len(true_pairs)
    n_cross = n * (n - 1) // 2 - len(true_pairs)
    assert n_false / n_cross < 0.01, (n_false, n_cross)


def test_collocations_pmi_crafted(spark):
    """Crafted corpus: a phrase always co-occurring ('hong kong') passes the
    cross-multiplied PMI gate; a frequent-but-independent pair does not."""
    from osmgraft.queries import collocations_pmi
    import osmgraft.queries as Q

    docs = spark.createDataFrame(
        [
            (1, "hong kong hong kong hong kong"),
            (2, "the cat the dog the cow the pig"),
            (3, "the fox the hen the owl the bee"),
        ],
        "doc_id long, text string",
    )
    orig = Q._docs
    Q._docs = lambda spark, sf_dir: docs
    try:
        out = {(r["w1"], r["w2"]): r for r in collocations_pmi(spark, "ignored").collect()}
    finally:
        Q._docs = orig
    assert ("hong", "kong") in out
    r = out[("hong", "kong")]
    assert r["c_ab"] == 3 and r["c_a"] == 3 and r["c_b"] == 3
    # 'the X' pairs: c('the')=8 dominates -> N*c_ab < 3*c_a*c_b, filtered
    assert all(w1 != "the" for (w1, _) in out)


# --- LCS pair join (order-preserving string similarity) ----------------------
def _lcs_ref(a, b):
    """Textbook quadratic LCS table (independent of both engines)."""
    m, n = len(a), len(b)
    dp = [[0] * (n + 1) for _ in range(m + 1)]
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[m][n]


def test_lcs_pairs_matches_brute_force(spark):
    from osmgraft.operators.dedup import lcs_pairs

    strs = {
        1: "abcdefgh",
        2: "axbyczdh",
        3: "hgfedcba",
        4: "abcd",
        5: "zzzz",
        6: "ab",
    }
    rows = [(i, 0, t) for i, t in strs.items()]
    df = spark.createDataFrame(rows, "doc_id long, g int, t string")
    got = {
        (r["doc_a"], r["doc_b"]): r["lcs_len"]
        for r in lcs_pairs(df, ["g"], min_lcs=0).collect()
    }
    import itertools

    for a, b in itertools.combinations(sorted(strs), 2):
        assert got[(a, b)] == _lcs_ref(strs[a], strs[b]), (a, b)


def test_lcs_pairs_subsequence_law_and_buckets(spark):
    """A scattered-insertion variant keeps the full original as its LCS;
    different buckets never pair; empty strings are excluded."""
    from osmgraft.operators.dedup import lcs_pairs

    rows = [
        (1, 0, "abcdefgh"),
        (2, 0, "abXcdYefZgh"),   # 1 interleaved -> LCS = 8
        (3, 1, "abcdefgh"),      # other bucket: no pair with 1/2
        (4, 0, ""),              # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, g int, t string")
    out = {
        (r["doc_a"], r["doc_b"]): r["lcs_len"]
        for r in lcs_pairs(df, ["g"], min_lcs=0).collect()
    }
    assert out == {(1, 2): 8}


def test_lcs_pairs_plan_no_python(spark):
    from osmgraft.operators.dedup import lcs_pairs

    df = spark.createDataFrame(
        [(1, 0, "ab"), (2, 0, "ba")], "doc_id long, g int, t string"
    )
    plan = (
        lcs_pairs(df, ["g"], min_lcs=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan and "Cartesian" not in plan


# --- soundex phonetic blocking -----------------------------------------------
def test_soundex_published_vectors(spark):
    """The classic NARA/Knuth test vectors, engine side."""
    from osmgraft.operators.dedup import soundex_expr

    vectors = {
        "Robert": "R163", "Rupert": "R163", "Ashcraft": "A261",
        "Ashcroft": "A261", "Tymczak": "T522", "Pfister": "P236",
        "Honeyman": "H555", "Washington": "W252", "Lee": "L000",
        "Gutierrez": "G362", "Jackson": "J250", "VanDeusen": "V532",
        "Smith": "S530", "Smyth": "S530", "Williams": "W452",
        "o'Brien": "O165", "Hrabal": "H614",
    }
    df = spark.createDataFrame([(n,) for n in vectors], "name string")
    got = {r["name"]: r["code"] for r in df.select(
        "name", soundex_expr("name").alias("code")).collect()}
    assert got == vectors


def test_soundex_pairs_blocks_homophones_only(spark):
    from osmgraft.operators.dedup import soundex_pairs

    names = ["Smith", "Smyth", "Robert", "Rupert", "Lee", "Garcia"]
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "name_id long, name string"
    )
    got = {(r["name_a"], r["name_b"]): r["code"]
           for r in soundex_pairs(df).collect()}
    assert got == {("Smith", "Smyth"): "S530", ("Robert", "Rupert"): "R163"}
