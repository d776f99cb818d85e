"""Training-data ops: text analysis, dedup strategies, similarity search, multimodal."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions import dedup as D
from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions import similarity as S
from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions import text as X
from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.multimodal import (
    extract_features, sample_frames, synthetic_media,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


# ------------------------------------------------------------------ text

def test_token_count_and_quality(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "   "), (3, None), (4, "a b  c")],
        "id int, text string",
    )
    got = {r["id"]: (r["n"], r["q"]) for r in df.select(
        "id", X.token_count("text").alias("n"), X.quality_score("text").alias("q")
    ).collect()}
    assert got[1][0] == 4
    assert got[2][0] == 0
    assert got[3] == (None, None)
    assert got[4][0] == 3
    assert 0.0 <= got[1][1] <= 1.0


def test_lang_id_votes(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog went to the park and it was fun"),
         (2, "el perro y el gato en la casa con los amigos"),
         (3, "le chat et le chien dans la maison pour les amis"),
         (4, "der hund und die katze ist von den kindern mit brot"),
         (5, "zzz qqq xxx")],
        "id int, text string",
    )
    got = {r["id"]: r["l"] for r in df.select("id", X.lang_id("text").alias("l")).collect()}
    assert got == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "und"}


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "HELLO\tWORLD "), (4, "other")],
        "id int, text string",
    )
    fps = [r[0] for r in df.select(X.fingerprint("text")).collect()]
    assert fps[0] == fps[1] == fps[2] != fps[3]


def test_shingles_and_rolling_fp(spark):
    df = spark.createDataFrame([(1, "a b c d e")], "id int, text string")
    sh = df.select(X.shingles("text", 3).alias("s")).first()["s"]
    assert sh == ["a b c", "b c d", "c d e"]
    short = spark.createDataFrame([(1, "one two")], "id int, text string")
    fp = short.select(X.rolling_fingerprint("text", 5).alias("f")).first()["f"]
    assert fp == short.select(X.fingerprint("text").alias("f")).first()["f"]


# ----------------------------------------------------------------- dedup

@pytest.fixture(scope="module")
def dup_docs(spark):
    rows = []
    for i in range(50):
        rows.append((i, f"unique document number {i} with words {i*7} and {i*13}"))
    rows.append((100, "unique document number 3 with words 21 and 39"))  # exact dup of 3
    rows.append((101, "Unique  Document Number 3 with words 21 and 39"))  # normalized dup
    rows.append((102, "unique document number 3 with words 21 and 40 extra"))  # near-dup
    long_text = " ".join(f"token{j}" for j in range(60))
    rows.append((103, long_text))                                   # long doc
    rows.append((104, long_text.replace("token30", "changed")))     # 1-word edit
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(dup_docs):
    kept = D.exact_dedup(dup_docs)
    ids = {r[0] for r in kept.select("doc_id").collect()}
    assert 100 not in ids and 101 not in ids  # dups collapsed to doc 3
    assert 3 in ids and 102 in ids
    groups = D.duplicate_groups(dup_docs).collect()
    assert len(groups) == 1 and groups[0]["n_dups"] == 3 and groups[0]["keep_id"] == 3


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = D.minhash_lsh_candidates(dup_docs, n_hashes=32, bands=16).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (3, 100) in got and (3, 101) in got  # exact dups always collide
    assert (3, 102) in got                       # near-dup lands in some band
    # sanity: nowhere near all-pairs
    assert len(got) < 100


def test_embedding_dedup_survivors(spark):
    # two exact-duplicate vectors + two distinct ones: the duplicate with the
    # larger id loses, everything else survives
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),   # dup of 1 -> loser
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    embs = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    surv = {r[0] for r in
            S.embedding_dedup_survivors(embs, dim=4, threshold=0.99,
                                        n_planes=4)
            .select("vec_id").collect()}
    assert surv == {1, 3, 4}


def test_dedup_survivors_drops_losers(dup_docs):
    surv = {r[0] for r in
            D.dedup_survivors(dup_docs, n_hashes=32, bands=16,
                              verify_threshold=0.5)
            .select("doc_id").collect()}
    all_ids = {r[0] for r in dup_docs.select("doc_id").collect()}
    # keep-lowest-id: the canonical doc 3 survives, its dups 100/101 do not
    assert 3 in surv
    assert 100 not in surv and 101 not in surv
    # every non-survivor is a loser id_b of some verified pair
    pairs = D.minhash_lsh_candidates(dup_docs, n_hashes=32, bands=16,
                                     verify_threshold=0.5).collect()
    losers = {r["id_b"] for r in pairs}
    assert all_ids - surv == losers


def test_ngram_jaccard_pairs(dup_docs):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in D.ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()}
    assert pairs[(3, 100)] == 1.0
    assert pairs[(3, 101)] == 1.0
    assert 0.5 <= pairs[(3, 102)] < 1.0


def test_simhash_candidates(dup_docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in D.simhash_candidates(dup_docs, max_hamming=10).collect()}
    assert pairs[(3, 100)] == 0   # exact dup -> identical simhash
    assert pairs[(3, 101)] == 0   # normalization-equal dup
    assert (103, 104) in pairs    # 1-word edit on a 60-word doc stays close
    assert 0 < pairs[(103, 104)] <= 10


def test_minhash_on_real_documents(docs):
    pairs = D.minhash_lsh_candidates(docs, n_hashes=16, bands=8)
    assert pairs.count() >= 0  # plumbing at sf scale


# ------------------------------------------------------------- similarity

def test_brute_force_topk_self_is_best(embs):
    row = embs.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    top = S.brute_force_topk(embs, q, k=5).collect()
    assert top[0]["vec_id"] == row["vec_id"]
    assert abs(top[0]["cos_sim"] - 1.0) < 1e-5
    sims = [r["cos_sim"] for r in top]
    assert sims == sorted(sims, reverse=True)


def test_lsh_topk_recall_overlap(embs):
    row = embs.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    exact = {r["vec_id"] for r in S.brute_force_topk(embs, q, k=10).collect()}
    approx = {r["vec_id"] for r in S.lsh_topk(embs, q, k=10, n_planes=4).collect()}
    assert row["vec_id"] in approx  # query's own bucket contains itself
    assert len(exact & approx) >= 1


def test_ivf_assign_covers_all(embs):
    cells = S.ivf_assign(embs, n_cells=8)
    n_cells = cells.select("ivf_cell").distinct().count()
    assert 1 < n_cells <= 8
    assert cells.filter(F.col("ivf_cell").isNull()).count() == 0


def test_ivf_topk_contains_self_and_overlaps_exact(embs):
    row = embs.orderBy("vec_id").first()
    q = [float(x) for x in row["embedding"]]
    exact = {r["vec_id"] for r in S.brute_force_topk(embs, q, k=10).collect()}
    approx = S.ivf_topk(embs, q, k=10, n_cells=8, n_probe=3).collect()
    ids = {r["vec_id"] for r in approx}
    # the query vector's own cell is always the top probe -> self is found
    assert row["vec_id"] in ids
    assert len(exact & ids) >= 1
    sims = [r["cos_sim"] for r in approx]
    assert sims == sorted(sims, reverse=True)

    # probing every cell degenerates to the exact answer
    full = {r["vec_id"] for r in S.ivf_topk(embs, q, k=10, n_cells=8, n_probe=8).collect()}
    assert full == exact


# ------------------------------------------------------------- multimodal

def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    for r in rows:
        assert len(r["feature"]) == 16
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
        assert r["n_bytes"] > 0
    # deterministic: same payload -> same feature
    again = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert again == {r["media_id"]: r["feature"] for r in rows}


def test_multimodal_frame_sampling(spark):
    media = synthetic_media(spark, n=9)
    frames = sample_frames(media, every_ms=1000)
    got = frames.groupBy("media_id").count().collect()
    durations = {r["media_id"]: r["meta"]["duration_ms"] for r in media.collect()}
    for r in got:
        assert r["count"] == durations[r["media_id"]] // 1000


def test_multimodal_resize_nearest_neighbor(spark):
    """resize_images: the numpy resample kernel is exact — verify against an
    independently computed nearest-neighbor reference per row."""
    import numpy as np

    from e2e_ocsf_cyber_lakehouse_blueprint_spark.functions.multimodal import (
        _pseudo_pixels, resize_images,
    )

    media = synthetic_media(spark, n=12)
    W, H = 8, 6
    out = {r["media_id"]: r for r in resize_images(media, W, H).collect()}
    src_rows = {r["media_id"]: r for r in media.collect()
                if r["kind"] == "image"}
    assert set(out) == set(src_rows)
    for mid, r in out.items():
        assert (r["meta"]["width"], r["meta"]["height"]) == (W, H)
        assert r["meta"]["codec"] == "raw-u8"
        assert len(bytes(r["payload"])) == W * H
        s = src_rows[mid]
        px = _pseudo_pixels(bytes(s["payload"]), s["meta"]["width"],
                            s["meta"]["height"])
        ys = (np.arange(H) * s["meta"]["height"] // H)
        xs = (np.arange(W) * s["meta"]["width"] // W)
        want = px[ys[:, None], xs[None, :]].tobytes()
        assert bytes(r["payload"]) == want


# ------------------------------------------- round-2 guards + completeness

def test_simhash_banding_complete_vs_bruteforce(docs):
    """Candidates == ALL pairs with hamming <= d (the banding never drops a
    pair): brute-force popcount over collected signatures is the oracle."""
    d = 10
    sub = docs.limit(200)
    sigs = {
        r["doc_id"]: r["sh"]
        for r in sub.select(
            "doc_id", D.simhash("text").alias("sh"),
            F.size(X.word_tokens("text")).alias("nw"),
        ).filter(F.col("nw") > 0).collect()
    }
    want = set()
    ids = sorted(sigs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= d:
                want.add((a, b))
    got = {(r["id_a"], r["id_b"])
           for r in D.simhash_candidates(sub, max_hamming=d).collect()}
    assert got == want
    assert any(True for _ in want)  # fixture actually exercises the path


def test_simhash_chunk_layout_pigeonhole():
    for d in (0, 3, 10, 31, 63, 100):
        layout = D.simhash_chunk_layout(d)
        assert len(layout) == min(64, d + 1)
        assert sum(w for _, w in layout) == 64
        offs = [o for o, _ in layout]
        assert offs == sorted(offs) and offs[0] == 0


def test_minhash_skew_guards(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),
         (3, "two words"),      # < shingle_k tokens -> excluded
         (4, ""), (5, None)],   # degenerate docs -> excluded
        "doc_id long, text string",
    )
    pairs = D.minhash_lsh_candidates(df, n_hashes=16, bands=4,
                                     verify_threshold=0.5).collect()
    assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in pairs] == [(1, 2, 1.0)]
    # bucket cap: with max_bucket=1 every shared bucket is dropped
    assert D.minhash_lsh_candidates(df, n_hashes=16, bands=4,
                                    max_bucket=1).count() == 0


def test_lsh_pairs_subset_of_exact(embs):
    exact = {(r["id_a"], r["id_b"]): r["cos_sim"]
             for r in S.pairwise_cosine_knn(embs, threshold=0.3).collect()}
    approx = {(r["id_a"], r["id_b"]): r["cos_sim"]
              for r in S.lsh_pairs(embs, dim=64, threshold=0.3, n_planes=4).collect()}
    assert set(approx) <= set(exact)
    assert all(exact[k] == v for k, v in approx.items())
    assert len(approx) > 0


def test_ann_persisted_index_prunes_partitions(spark, embs, tmp_path):
    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    idx = str(tmp_path / "ivf")
    S.ivf_write_index(embs, idx, n_cells=8)
    probe = S.ivf_probe_cells(q, n_cells=8, n_probe=3)
    pruned = spark.read.parquet(idx).filter(F.col("ivf_cell").isin(probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "ivf_cell" in plan and "PartitionFilters" in plan
    # identical results to the recompute path
    via_index = [r["vec_id"] for r in
                 S.topk_over_index(spark, idx, "ivf_cell", probe, q, k=10).collect()]
    direct = [r["vec_id"] for r in
              S.ivf_topk(embs, q, k=10, n_cells=8, n_probe=3).collect()]
    assert via_index == direct


def test_ivf_dim_mismatch_fails_fast(embs):
    import pytest as _pytest
    with _pytest.raises(ValueError, match="dim"):
        S.ivf_topk(embs, [1.0, 2.0], k=5)


def test_ivf_train_improves_objective_and_recall(embs):
    import numpy as np

    rows = embs.select("embedding").collect()
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)

    def objective(C):
        # mean max-cosine to the assigned centroid (higher = tighter cells)
        return float((Vn @ C.T).max(axis=1).mean())

    random_C = S._ivf_centroids(8, V.shape[1], seed=13)
    trained_C = S.ivf_train(embs, n_cells=8, n_iters=4, seed=13)
    assert trained_C.shape == random_C.shape
    assert np.allclose(np.linalg.norm(trained_C, axis=1), 1.0)
    assert objective(trained_C) > objective(random_C)

    # trained centroids flow through assign/probe/topk consistently
    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]
    probe = S.ivf_probe_cells(q, n_cells=8, n_probe=3, centroids=trained_C)
    got = S.ivf_topk(embs, q, k=10, n_cells=8, n_probe=3,
                     centroids=trained_C).collect()
    assert got[0]["vec_id"] == embs.orderBy("vec_id").first()["vec_id"]
    exact = {r["vec_id"]
             for r in S.brute_force_topk(embs, q, k=10).collect()}
    assert len({r["vec_id"] for r in got} & exact) >= 3
    assert all(0 <= c < 8 for c in probe)


def test_ngram_jaccard_hot_shingle_df_cap(spark):
    """One boilerplate shingle present in EVERY doc must not quadratically
    blow up the shared-shingle join: with max_df below the corpus size the
    hot shingle is dropped from candidate generation, pair counts stay
    bounded by the genuinely-similar groups, and surviving pairs still score
    EXACT jaccard over the full (uncapped) shingle sets."""
    boiler = "copyright acme corp all rights reserved"
    rows = []
    for i in range(300):
        body = f"unique text body number {i} " + " ".join(
            f"w{i}x{j}" for j in range(10))
        rows.append((i, body + " " + boiler))
    # two true near-dup pairs that share ONLY sub-cap shingles
    rows.append((1000, rows[0][1]))
    rows.append((1001, rows[1][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = D.ngram_jaccard_pairs(df, threshold=0.9, max_df=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert got == {(0, 1000), (1, 1001)}
    assert all(r["jaccard"] == 1.0 for r in pairs)

    # candidate volume is bounded: even at threshold 0 the capped join never
    # expands the boilerplate bucket's O(n^2) pairs
    n_cand = D.ngram_jaccard_pairs(df, threshold=0.0, max_df=50).count()
    assert n_cand <= 10  # vs ~45k all-pairs if the hot shingle joined


def test_simhash_hot_bucket_cap(spark):
    """A near-identical corpus slab (every doc shares every signature chunk)
    must not make one reducer expand O(b^2) pairs: with max_bucket below the
    slab size the hot (ci, cv) buckets are dropped, pair counts stay bounded,
    and genuinely-distinct near-dup pairs outside the slab still surface."""
    slab_text = "terms of service apply to every page of this website footer"
    rows = [(i, slab_text) for i in range(400)]
    # two distinct near-dup pairs whose chunk buckets stay sub-cap
    rows += [(1000, "orange bicycle thunder marble quiet violet ladder"),
             (1001, "orange bicycle thunder marble quiet violet ladder"),
             (2000, "crimson harbor velvet anchor silent meadow lantern"),
             (2001, "crimson harbor velvet anchor silent meadow lantern")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = D.simhash_candidates(df, max_hamming=3, max_bucket=50).collect()
    got = {(r["id_a"], r["id_b"]) for r in capped}
    assert got == {(1000, 1001), (2000, 2001)}
    assert all(r["hamming"] == 0 for r in capped)

    # default cap (10k) leaves the small slab intact: full clique recovered
    n_all = D.simhash_candidates(df, max_hamming=3).count()
    assert n_all == (400 * 399) // 2 + 2


def test_lsh_pairs_hot_bucket_cap_and_multitable(spark):
    """A dominant embedding cluster concentrating into one signature bucket
    must not blow up the self-join: with max_bucket below the cluster size
    its bucket is dropped while sub-cap pairs survive; n_tables>1 OR-amplifies
    recall back (independent hyperplane sets re-bucket the survivors)."""
    import random
    rnd = random.Random(42)
    base = [rnd.gauss(0, 1) for _ in range(16)]
    rows = []
    for i in range(300):  # dominant cluster: tiny perturbations of one vector
        rows.append((i, [x + rnd.gauss(0, 1e-3) for x in base]))
    # an isolated near-pair far from the cluster
    other = [-x for x in base]
    rows.append((1000, other))
    rows.append((1001, [x + 1e-3 for x in other]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = S.lsh_pairs(df, dim=16, threshold=0.99, n_planes=4, max_bucket=50)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert got == {(1000, 1001)}

    # multi-table on real embeddings: recall(n_tables=3) >= recall(n_tables=1),
    # still a subset of the exact verifier
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"])
             for r in S.pairwise_cosine_knn(embs, threshold=0.3).collect()}
    one = {(r["id_a"], r["id_b"])
           for r in S.lsh_pairs(embs, dim=64, threshold=0.3, n_planes=4).collect()}
    multi = {(r["id_a"], r["id_b"])
             for r in S.lsh_pairs(embs, dim=64, threshold=0.3, n_planes=4,
                                  n_tables=3).collect()}
    assert one <= multi <= exact


def test_ann_index_incremental_append_parity(spark, embs, tmp_path):
    """Incremental index maintenance (VERDICT r4 item #5): appending new
    vectors with the build-time centroids/planes must (a) make probes see
    new AND old vectors without touching the index body, and (b) be
    row-identical to a fresh full rebuild over old+new."""
    old = embs.filter(F.col("vec_id") % 5 != 0)
    new = embs.filter(F.col("vec_id") % 5 == 0)
    assert old.count() > 0 and new.count() > 0
    q = [float(x) for x in embs.orderBy("vec_id").first()["embedding"]]

    # --- IVF: trained centroids shared between build and append
    C = S.ivf_train(old.sample(0.5, seed=7), n_cells=8, n_iters=2)
    inc = str(tmp_path / "ivf_inc")
    S.ivf_write_index(old, inc, n_cells=8, centroids=C)
    S.ivf_append_index(new, inc, n_cells=8, centroids=C)
    full = str(tmp_path / "ivf_full")
    S.ivf_write_index(embs, full, n_cells=8, centroids=C)
    probe = S.ivf_probe_cells(q, n_cells=8, n_probe=3, centroids=C)
    got = [(r["vec_id"], r["cos_sim"]) for r in
           S.topk_over_index(spark, inc, "ivf_cell", probe, q, k=10).collect()]
    want = [(r["vec_id"], r["cos_sim"]) for r in
            S.topk_over_index(spark, full, "ivf_cell", probe, q, k=10).collect()]
    assert got == want
    # probes actually see both eras
    seen = {r["vec_id"] for r in
            S.topk_over_index(spark, inc, "ivf_cell", list(range(8)), q,
                              k=embs.count()).collect()}
    assert seen == {r["vec_id"] for r in embs.select("vec_id").collect()}

    # --- LSH: same planes (dim/n_planes/seed) between build and append
    inc2 = str(tmp_path / "lsh_inc")
    S.lsh_write_index(old, inc2, dim=64, n_planes=4)
    S.lsh_append_index(new, inc2, dim=64, n_planes=4)
    full2 = str(tmp_path / "lsh_full")
    S.lsh_write_index(embs, full2, dim=64, n_planes=4)
    inc_rows = sorted((r["vec_id"], r["lsh_bucket"]) for r in
                      spark.read.parquet(inc2).collect())
    full_rows = sorted((r["vec_id"], r["lsh_bucket"]) for r in
                       spark.read.parquet(full2).collect())
    assert inc_rows == full_rows
