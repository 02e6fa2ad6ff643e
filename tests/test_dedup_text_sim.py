"""Dedup / text-analysis / similarity operator tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pythongis_spark.operators import dedup as D
from pythongis_spark.operators import similarity as S
from pythongis_spark.operators import text as TX


@pytest.fixture(scope="module")
def docs(spark):
    """Synthetic corpus with planted duplicate clusters."""
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away home",
        "a completely different sentence about spark dataframes and shuffles",
        "der schnelle braune fuchs springt ueber den faulen hund und rennt",
        "le renard brun rapide saute par dessus le chien paresseux et court",
    ]
    rows = []
    did = 0
    for i, t in enumerate(base):
        for rep in range(3):  # 3 near-identical copies (tiny suffix change)
            suffix = "" if rep == 0 else f" extra{rep}"
            rows.append(dict(doc_id=did, text=t + suffix, cluster=i))
            did += 1
    for j in range(20):  # unique noise docs
        rows.append(
            dict(
                doc_id=did,
                text=" ".join(f"tok{j}_{n}" for n in range(30)),
                cluster=-1,
            )
        )
        did += 1
    # one exact duplicate pair
    rows.append(dict(doc_id=did, text=rows[0]["text"], cluster=0))
    return spark.createDataFrame(pd.DataFrame(rows)).cache()


def test_dedup_exact(spark, docs):
    out = D.dedup_exact(docs, ["text"], "doc_id").toPandas()
    dups = out[out.dup_count > 1]
    assert len(dups) == 1
    assert dups.iloc[0]["keeper_id"] == 0
    rows = D.dedup_exact_rows(docs, ["text"], "doc_id")
    assert rows.count() == docs.count() - 1


def test_minhash_lsh_finds_planted_dups(spark, docs):
    pairs = D.minhash_lsh_pairs(docs, "doc_id", threshold=0.6).toPandas()
    clusters = docs.select("doc_id", "cluster").toPandas().set_index("doc_id")["cluster"]
    # every planted same-cluster pair recovered (0,1,2), (3,4,5)... incl exact dup
    found = {(a, b) for a, b in zip(pairs.a_id, pairs.b_id)}
    for c in range(4):
        ids = sorted(clusters[clusters == c].index)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in found, (c, ids[i], ids[j])
    # no cross-cluster false positives at this threshold
    for a, b in found:
        assert clusters[a] == clusters[b] or {clusters[a], clusters[b]} == {0}


def test_simhash_near_dup(spark, docs):
    pairs = D.simhash_near_dup_pairs(docs, "doc_id", max_hamming=6).toPandas()
    clusters = docs.select("doc_id", "cluster").toPandas().set_index("doc_id")["cluster"]
    found = {(a, b) for a, b in zip(pairs.a_id, pairs.b_id)}
    assert (0, 32) in found  # exact dup pair has hamming 0
    for a, b in found:
        assert clusters[a] == clusters[b]


def test_ngram_jaccard_pairs(spark, docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.6).toPandas()
    assert len(pairs) > 0
    clusters = docs.select("doc_id", "cluster").toPandas().set_index("doc_id")["cluster"]
    for a, b, j in zip(pairs.a_id, pairs.b_id, pairs.jaccard):
        assert clusters[a] == clusters[b]
        assert 0.6 <= j <= 1.0


def test_connected_components(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": [1, 2, 10, 11], "b_id": [2, 3, 11, 12]})
    )
    cc = D.connected_components(pairs).toPandas().set_index("id")["component"]
    assert cc[1] == cc[2] == cc[3] == 1
    assert cc[10] == cc[11] == cc[12] == 10


def test_connected_components_long_chain(spark):
    # Diameter-40 chain: min-label propagation with a 10-round cap would
    # silently mislabel this; large-star/small-star converges in O(log n).
    n = 40
    pairs = spark.createDataFrame(
        pd.DataFrame({"a_id": list(range(n)), "b_id": list(range(1, n + 1))})
    )
    cc = D.connected_components(pairs).toPandas().set_index("id")["component"]
    assert len(cc) == n + 1
    assert (cc == 0).all()


def test_lsh_joins_shuffle_ids_only(spark, docs):
    # Scale guard: the candidate-pair plan before the Jaccard verify must
    # not carry the text payload through the band/bucket exchange.
    df = D.minhash_lsh_pairs(docs, "doc_id")
    txt = df._jdf.queryExecution().optimizedPlan().toString()
    # text appears only below the two final text-rejoin joins (for the
    # verify), never alongside band/bucket columns.
    for line in txt.splitlines():
        low = line.lower()
        if "bucket" in low and "band" in low:
            assert "text" not in low, line


def test_embedding_neardup_with_planted(spark):
    rng = np.random.Generator(np.random.PCG64(0))
    base = rng.standard_normal((50, 16))
    vecs = [v / np.linalg.norm(v) for v in base]
    # plant near-dups: ids 50..54 are tiny perturbations of 0..4
    for i in range(5):
        v = base[i] + rng.standard_normal(16) * 0.01
        vecs.append(v / np.linalg.norm(v))
    pdf = pd.DataFrame(
        {"vec_id": range(55), "embedding": [list(map(float, v)) for v in vecs]}
    )
    df = spark.createDataFrame(pdf)
    pairs = D.embedding_neardup_pairs(df, threshold=0.98, planes=8).toPandas()
    found = {(a, b) for a, b in zip(pairs.a_id, pairs.b_id)}
    hits = sum((i, 50 + i) in found for i in range(5))
    assert hits >= 4  # LSH recall is probabilistic; ≥4/5 with 2 bands


def test_langid(spark, docs):
    out = TX.lang_id(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "lang_pred"] == "en"
    assert out.loc[6, "lang_pred"] == "de"
    assert out.loc[9, "lang_pred"] == "fr"
    assert out.loc[12 + 12, "lang_pred"] == "und"  # noise doc


def test_token_counts_and_quality(spark, docs):
    out = TX.with_token_counts(docs).toPandas().set_index("doc_id")
    assert out.loc[0, "n_tokens_ws"] == len(
        "the quick brown fox jumps over the lazy dog and runs far away home".split()
    )
    q = TX.quality_score(docs).toPandas()
    assert ((0 <= q["quality"]) & (q["quality"] <= 1)).all()
    en = q[q.doc_id == 0]["quality"].iloc[0]
    noise = q[q.doc_id == 20]["quality"].iloc[0]
    assert en > noise  # stopword-rich english beats tok_noise


def test_fingerprint_and_winnow(spark, docs):
    fp = TX.fingerprint(docs).toPandas()
    byid = fp.set_index("doc_id")["fp"]
    assert byid[0] == byid[32]  # exact dup (last row) shares fingerprint
    assert byid[0] != byid[1]
    wf = TX.winnow_fingerprints(docs.limit(5)).toPandas()
    assert all(len(r) > 0 for r in wf["fps"])


def test_cosine_topk_and_ivf(spark):
    rng = np.random.Generator(np.random.PCG64(1))
    M = rng.standard_normal((300, 16))
    pdf = pd.DataFrame(
        {"vec_id": range(300), "embedding": [list(map(float, v)) for v in M]}
    )
    df = spark.createDataFrame(pdf).cache()
    q = M[7]
    got = S.cosine_topk(df, q, k=5).toPandas()
    # numpy oracle
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    scores = Mn @ (q / np.linalg.norm(q))
    expect = np.argsort(-scores, kind="stable")[:5].tolist()
    assert got["vec_id"].tolist() == expect
    assert got["vec_id"].iloc[0] == 7

    # IVF path: recall of exact top-1 with generous nprobe
    C = S.kmeans_centroids(df, n_centroids=8, iters=3)
    assigned = S.ivf_assign(df, C).cache()
    approx = S.ivf_topk(assigned, C, q, k=5, nprobe=4).toPandas()
    assert 7 in approx["vec_id"].tolist()


def test_pairwise_topk_join(spark):
    rng = np.random.Generator(np.random.PCG64(2))
    M = rng.standard_normal((100, 8))
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(100), "embedding": [list(map(float, v)) for v in M]})
    )
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": [0, 1], "embedding": [list(map(float, M[3])), list(map(float, M[50]))]})
    )
    out = S.pairwise_topk_join(queries, corpus, k=3).toPandas()
    assert len(out) == 6
    top1 = out[out.rk == 1].set_index("q_id")["vec_id"]
    assert top1[0] == 3 and top1[1] == 50


def test_bucket_cap_bounds_degenerate_buckets(spark):
    """10k copies of one boilerplate doc: candidate generation must emit
    O(B) hub-star pairs, not B²/2 ≈ 5·10⁷ — and the verified cluster must
    still connect every copy (VERDICT r3 scale hole #2)."""
    n = 10_000
    pdf = pd.DataFrame(
        {"doc_id": range(n),
         "text": ["identical boilerplate navigation footer text here"] * n}
    )
    docs = spark.createDataFrame(pdf)
    pairs = D.minhash_lsh_pairs(docs, "doc_id", threshold=0.9, bucket_cap=100)
    n_pairs = pairs.count()
    # hub-star: ≤ (n-1) pairs per (band,bucket) dedup to exactly n-1 hubs
    assert n_pairs == n - 1, n_pairs
    comp = D.connected_components(pairs).toPandas()
    assert len(comp) == n and comp["component"].nunique() == 1
    # small buckets keep full all-pairs semantics: 5 copies < cap
    small = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(5), "text": ["same tiny doc body"] * 5})
    )
    full = D.minhash_lsh_pairs(small, "doc_id", threshold=0.9, bucket_cap=100)
    assert full.count() == 10  # C(5,2)


def test_bucket_cap_embedding_and_histogram(spark):
    """Embedding LSH: a vector farm (same vector 2k times) is hub-starred;
    lsh_bucket_histogram reports what the cap would bite."""
    n = 2_000
    vec = [1.0, 0.5, -0.25, 2.0]
    pdf = pd.DataFrame({"vec_id": range(n), "embedding": [vec] * n})
    df = spark.createDataFrame(pdf)
    pairs = D.embedding_neardup_pairs(df, bucket_cap=64)
    assert pairs.count() == n - 1
    banded = df.select(
        F.col("vec_id").alias("_id"), F.lit(0).alias("band"), F.lit(0).alias("bucket")
    )
    hist = D.lsh_bucket_histogram(banded, bucket_cap=64).toPandas()
    capped = hist[hist.capped]
    assert len(capped) == 1 and capped.iloc[0]["uncapped_pairs"] == n * (n - 1) / 2


def test_pairwise_topk_bounded_and_exact(spark):
    """VERDICT r3 scale hole #1: the rewritten pairwise_topk_join must
    (a) match brute-force exactly incl. ties across Arrow-batch borders,
    (b) raise on an oversized query side instead of collecting it."""
    rng = np.random.Generator(np.random.PCG64(7))
    n, d, nq, k = 3000, 16, 40, 5
    M = rng.standard_normal((n, d))
    corpus = spark.createDataFrame(
        pd.DataFrame({"vec_id": range(n), "embedding": [list(map(float, v)) for v in M]})
    ).repartition(8)  # several partitions -> several partial-topk batches
    Qm = M[rng.choice(n, nq, replace=False)] + rng.standard_normal((nq, d)) * 0.01
    queries = spark.createDataFrame(
        pd.DataFrame({"q_id": range(nq), "embedding": [list(map(float, v)) for v in Qm]})
    )
    out = S.pairwise_topk_join(queries, corpus, k=k).toPandas()
    assert len(out) == nq * k
    # brute-force oracle
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    Qn = Qm / np.linalg.norm(Qm, axis=1, keepdims=True)
    Sm = Qn @ Mn.T  # (nq, n)
    for q in range(nq):
        order = np.lexsort((np.arange(n), -Sm[q]))[:k]
        got = out[out.q_id == q].sort_values("rk")["vec_id"].to_numpy()
        assert (got == order).all(), (q, got, order)
    # cap: oversized query side raises rather than collecting unbounded
    with pytest.raises(ValueError, match="max_queries"):
        S.pairwise_topk_join(queries, corpus, k=k, max_queries=10)


def test_ngram_jaccard_exact_vs_bruteforce_boilerplate(spark):
    """AllPairs prefix filtering must equal brute-force jaccard on an
    adversarial corpus where qualifying pairs share mostly COMMON
    (boilerplate) shingles — exactly the configuration the former
    smallest-hash sampling policy missed at sf0.1 (its 32-hash sample
    favored each doc's unique tail, so boilerplate-similar pairs never
    shared a sampled shingle)."""
    import itertools

    rng = np.random.default_rng(5)
    boiler = "terms of service apply to all content on this site "
    docs = []
    for i in range(60):
        tail = " ".join(
            f"w{rng.integers(0, 50)}" for _ in range(rng.integers(3, 30))
        )
        docs.append((i, boiler * 2 + tail))
    sdf = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = D.ngram_jaccard_pairs(sdf, "doc_id", threshold=0.5).toPandas()
    got_pairs = {(a, b) for a, b in zip(got.a_id, got.b_id)}

    def jac(a, b):
        sa = set(D._shingle_hashes(a, 5).tolist())
        sb = set(D._shingle_hashes(b, 5).tolist())
        return len(sa & sb) / len(sa | sb)

    expected = {
        (i, j)
        for (i, ta), (j, tb) in itertools.combinations(docs, 2)
        if jac(ta, tb) >= 0.5
    }
    assert got_pairs == expected
    assert len(expected) > 100  # the corpus genuinely has many near-dups


def test_boilerplate_counts(spark):
    rows = [
        (0, "nav home about contact alpha beta gamma"),
        (1, "nav home about contact delta epsilon zeta"),
        (2, "nav home about contact eta theta iota"),
        (3, "entirely unique words with no shared trigrams at all"),
        (4, "xy"),  # shorter than n=3 tokens -> zero grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["n_grams"], r["n_hot"])
        for r in TX.boilerplate_counts(df, "doc_id", n=3, min_docs=3).collect()
    }
    # "nav home about" + "home about contact" occur in 3 docs -> hot
    for d in (0, 1, 2):
        assert got[d][0] == 5 and got[d][1] == 2
    assert got[3] == (7, 0)
    assert got[4] == (0, 0)  # short doc survives with zeros (left join)


def test_redact_pii(spark):
    rows = [
        (0, "mail me at jane.doe+x@examp-le.org today"),
        (1, "ssn 123-45-6789 phone 555-123-4567 ip 10.0.0.1"),
        (2, "clean text with no identifiers"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r.asDict() for r in TX.redact_pii(df).collect()}
    assert out[0]["n_pii_email"] == 1 and "<PII> today" in out[0]["text"]
    assert "jane" not in out[0]["text"]
    r1 = out[1]
    assert (r1["n_pii_ssn"], r1["n_pii_phone"], r1["n_pii_ipv4"]) == (1, 1, 1)
    assert r1["text"] == "ssn <PII> phone <PII> ip <PII>"
    assert out[2]["text"] == rows[2][1]
    # counts are on the original text: an SSN is NOT double-counted as
    # a phone (different middle-group widths)
    assert r1["n_pii_email"] == 0
    # pure-Catalyst: no Python eval, no shuffle in the plan
    plan = (
        TX.redact_pii(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_repetition_signals(spark):
    rows = [
        (0, "spam spam spam spam"),                    # maximal repetition
        (1, "all tokens here are fully distinct"),     # none
        (2, "ab ab cd ab ab cd"),                      # repeated 2-grams
        (3, "solo"),                                   # 1 token, no 2-grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in TX.repetition_signals(df).collect()}
    r0 = got[0]
    assert (r0["rep_n_tokens"], r0["rep_n_distinct"], r0["rep_top_token"]) == (4, 1, 4)
    assert (r0["rep_n_2grams"], r0["rep_dup_2grams"]) == (3, 3)  # "spam spam" x3
    r1 = got[1]
    assert r1["rep_n_distinct"] == r1["rep_n_tokens"] == 6
    assert r1["rep_top_token"] == 1 and r1["rep_dup_2grams"] == 0
    r2 = got[2]
    # grams: "ab ab","ab cd","cd ab","ab ab","ab cd" -> dups: 2+2=4 of 5
    assert (r2["rep_n_2grams"], r2["rep_dup_2grams"]) == (5, 4)
    r3 = got[3]
    assert (r3["rep_n_tokens"], r3["rep_n_2grams"], r3["rep_dup_2grams"]) == (1, 0, 0)
    # pure projection: no shuffle, no Python in the plan
    plan = (
        TX.repetition_signals(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan and "Exchange" not in plan


def test_semantic_dedup_bruteforce_parity(spark, sf_dir):
    """semantic_dedup (anchor assign → within-cluster τ-pairs → CC →
    keep min id) matches a numpy brute force on the real embeddings
    table, and the kept set is consistent with the grp labels."""
    import numpy as np

    from pythongis_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").collect()
    ids = np.array([r[0] for r in rows])
    M = np.array([r[1] for r in rows], dtype=np.float64)
    Mn = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)
    anchors = M[:4]
    An = anchors / np.linalg.norm(anchors, axis=1, keepdims=True)
    cell = (Mn @ An.T).argmax(axis=1)
    # brute-force within-cluster pairs at tau, then min-label closure
    S = Mn @ Mn.T
    n = len(ids)
    parent = {int(i): int(i) for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if cell[i] == cell[j] and S[i, j] >= 0.45:
                ra, rb = find(int(ids[i])), find(int(ids[j]))
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    expect = {
        int(v): (int(cell[k]), find(int(v)), find(int(v)) == int(v))
        for k, v in enumerate(ids)
    }
    got = {
        r.vec_id: (r.cell, r.grp, r.keep)
        for r in semantic_dedup(emb, tau=0.45, anchors=anchors).collect()
    }
    assert got == expect
    assert any(not k for _, _, k in got.values())  # dups exist in the corpus


def test_semantic_dedup_bucket_cap_keeps_clusters_connected(spark, sf_dir):
    """With a tiny bucket_cap the candidate pairs hub-star, but groups
    that survive the exact cosine verify stay connected through the
    hub: keep-count can only grow (never lose a true representative)."""
    from pythongis_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    import numpy as np

    rows = emb.select("embedding").orderBy("vec_id").limit(4).collect()
    anchors = np.array([r[0] for r in rows], dtype=np.float64)
    full = semantic_dedup(emb, tau=0.45, anchors=anchors)
    capped = semantic_dedup(emb, tau=0.45, anchors=anchors, bucket_cap=8)
    n_full = full.filter("keep").count()
    n_capped = capped.filter("keep").count()
    assert n_capped >= n_full
    assert capped.count() == full.count()


def test_gopher_filter_rules_fire_both_ways(spark):
    """Crafted strings flip every Gopher rule in both directions,
    including the mwl/alpha rules the corpus gate can't flip."""
    from pythongis_spark.operators.text import gopher_filter

    # 60+ DISTINCT words (a repeated sentence rightly fails the
    # dup-2-gram rule), stopwords present, mean word length in range
    good = ("the quick brown fox jumps over that lazy dog and friends "
            "keep having words with everyone nearby today while rivers "
            "flow under bright skies children read books about distant "
            "planets wonder fills every morning before school starts "
            "teachers drink coffee students write essays gardens bloom "
            "softly autumn leaves drift past open windows music plays "
            "gently somewhere villages wake slowly mountains guard "
            "valleys oceans carry ships toward harbors full of light")
    cases = [
        ("ok", good, None, True),
        ("short", "the cat sat with that hat", "r_nwords", False),
        ("mwl_long", " ".join(["absolutely"] * 30 + [
            "supercalifragilisticexpialidocious"] * 40) + " the of", "r_mwl", False),
        ("alpha", good + " " + " ".join(str(n) for n in range(90)), "r_alpha", False),
        ("nostop", ("lorem ipsum dolor sit amet consectetur adipiscing "
                    "elit sed do eiusmod tempor incididunt ut labore ") * 8,
         "r_stop", False),
        ("symbols", good + " " + "### ... " * 10, "r_symbol", False),
        ("repeat2", good + " spam ham" * 40, "r_rep2", False),
        ("toptok", good + " spam" * 60, "r_toptok", False),
    ]
    df = spark.createDataFrame(
        [(n, t) for n, t, _, _ in cases], "doc_id string, text string"
    )
    got = {r.doc_id: r.asDict() for r in gopher_filter(df).collect()}
    assert got["ok"]["keep"] is True
    for name, _, rule, keep in cases:
        assert got[name]["keep"] is keep, (name, got[name])
        if rule is not None:
            assert got[name][rule] is False, (name, rule, got[name])


def test_gopher_filter_mean_word_len_short_side(spark):
    """mwl also fails on the short side (mean word length < 3)."""
    from pythongis_spark.operators.text import gopher_filter

    txt = "a b c d e " * 12 + "the of to be"  # 64 words, mean len ~1
    df = spark.createDataFrame([("x", txt)], "doc_id string, text string")
    row = gopher_filter(df).collect()[0]
    assert row.r_mwl is False and row.keep is False and row.r_nwords is True


def test_exact_substring_signals_planted(spark):
    """A shared 10-token run across two docs (and a within-doc repeat
    in a third) is detected and stripped exactly; unique docs untouched."""
    from pythongis_spark.operators.dedup import exact_substring_signals

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        ("a", f"one two three {shared} four five six seven eight nine"),
        ("b", f"red green blue {shared} cyan magenta yellow black white"),
        ("c", "solo " + "rep one two three four five six seven " * 2 + "tail"),
        ("d", "totally unique words without any duplicated window here "
              "every token differs across this entire small document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r.doc_id: r for r in exact_substring_signals(df, k=8).collect()}
    # the 10-token shared run has 3 hot 8-gram starts per doc → covers
    # exactly the 10 shared tokens
    assert got["a"].n_hot_starts == 3 and got["a"].n_dup_tokens == 10
    assert got["b"].n_dup_tokens == 10
    assert shared not in got["a"].text_clean
    assert got["a"].text_clean == (
        "one two three four five six seven eight nine"
    )
    # within-doc repetition also counts (min_count over the CORPUS)
    assert got["c"].n_hot_starts > 0 and got["c"].n_dup_tokens > 0
    assert got["d"].n_hot_starts == 0 and got["d"].n_dup_tokens == 0
    assert got["d"].text_clean.startswith("totally unique")


def test_c4_clean_rules(spark):
    """Every C4 line rule and page flag fires on crafted pages."""
    from pythongis_spark.operators.text import c4_clean

    rows = [
        # all three sentences survive -> keep
        (1, "One good sentence lands right here. Another proper sentence follows now.\n"
            "And a third full sentence closes the page."),
        # short line + javascript line + unterminated line all dropped
        (2, "One good sentence lands right here. A second one follows. A third one too.\n"
            "too short.\nplease enable javascript to continue reading.\n"
            "this line has no terminal punctuation at all"),
        # brace page: line survives the filter but the page is dropped
        (3, "Perfectly fine sentence one lands. Sentence two lands. Sentence three lands.\n"
            "var x = { a: 1 };"),
        # lorem page dropped even though every line is clean
        (4, "Lorem ipsum dolor sit amet consectetur. Good sentence two lands here.\n"
            "Good sentence three closes it out."),
        # quote-terminated line counts as terminal punctuation
        (5, 'He said the words "this is a full quote." A second sentence lands here.\n'
            "A third sentence finishes the page."),
        # fewer than 3 sentences -> dropped
        (6, "Only one good sentence lands here."),
    ]
    out = {r["doc_id"]: r for r in
           c4_clean(spark.createDataFrame(rows, "doc_id int, text string"))
           .collect()}
    assert out[1]["keep"] and out[1]["c4_n_kept"] == 2
    assert out[2]["keep"] and out[2]["c4_n_kept"] == 1 and out[2]["c4_n_lines"] == 4
    assert not out[3]["keep"] and out[3]["c4_has_brace"]
    assert not out[4]["keep"] and out[4]["c4_has_lorem"]
    assert out[5]["keep"] and out[5]["c4_n_sentences"] == 3
    assert not out[6]["keep"] and out[6]["c4_n_sentences"] == 1
    # cleaned text drops exactly the bad lines
    assert out[2]["text_clean"].count("\n") == 0


def test_lm_fit_brute_force_parity(spark):
    from collections import Counter

    from pythongis_spark.operators.text import bigram_lm_counts, lm_fit

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "the dog sat on the mat"),
        (4, "one"),                      # zero bigrams
        (5, ""),                         # empty
        (6, "the cat sat on the mat"),   # exact dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    counts = bigram_lm_counts(df, min_count=2)
    got = {r["doc_id"]: r for r in lm_fit(df, counts, "doc_id").collect()}

    # brute force
    def grams(t):
        toks = [w for w in t.lower().split() if w]
        return [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]

    table = Counter(g for _, t in rows for g in grams(t))
    table = {g: c for g, c in table.items() if c >= 2}
    for doc_id, t in rows:
        gs = grams(t)
        assert got[doc_id]["n_bigrams"] == len(gs)
        assert got[doc_id]["n_hits"] == sum(g in table for g in gs)
        assert got[doc_id]["hit_cnt_sum"] == sum(table.get(g, 0) for g in gs)
    assert got[4]["n_bigrams"] == 0 and got[4]["lm_nll"] is None
    # better-fitting doc scores lower nll than the rarer variant
    assert got[1]["lm_nll"] < got[2]["lm_nll"]


def test_incremental_dedup_hash_vs_string_key(spark):
    """hash_key scale path and the string-key oracle path agree, and
    normalization-equal (not byte-equal) texts count as seen."""
    from pythongis_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [(100, "The CAT sat."), (101, "a brand new page")],
        "doc_id int, text string",
    )
    new = spark.createDataFrame(
        [(1, "the cat sat"),        # normalization-equal to 100 -> dropped
         (2, "a brand new page"),   # byte-equal to 101 -> dropped
         (3, "something else")],    # unseen -> kept
        "doc_id int, text string",
    )
    for hk in (False, True):
        out = incremental_dedup(new, seen, "doc_id", hash_key=hk)
        assert sorted(r["doc_id"] for r in out.collect()) == [3], hk
        aud = incremental_dedup(new, seen, "doc_id", hash_key=hk, keep=False)
        assert sorted(r["doc_id"] for r in aud.collect()) == [1, 2], hk


def test_incremental_dedup_null_text_parity(spark):
    """NULL-text rows are kept on BOTH key paths: xxhash64(NULL) would
    otherwise collapse to the seed constant and match any NULL-text
    seen row, while string keys never join on NULL."""
    from pythongis_spark.operators.dedup import incremental_dedup

    seen = spark.createDataFrame(
        [(100, None), (101, "known text")], "doc_id int, text string")
    new = spark.createDataFrame(
        [(1, None), (2, "known text"), (3, "fresh")],
        "doc_id int, text string")
    for hk in (False, True):
        out = incremental_dedup(new, seen, "doc_id", hash_key=hk)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3], hk
        aud = incremental_dedup(new, seen, "doc_id", hash_key=hk, keep=False)
        assert sorted(r["doc_id"] for r in aud.collect()) == [2], hk
