"""Deduplication operators for web-scale training-data pipelines.

The reference dedups via Neo4j MERGE on primary keys (NI ``load_df
merge=True``, call sites data_loaders/file_data_loader.py:198,268) — exact
identity only.  A 100 TB text corpus needs the full ladder:

- exact          hash-groupBy on content (one shuffle on a short digest)
- ngram_jaccard  shingle-set similarity, exact, via self-join (quadratic in
                 bucket size — always run behind a candidate filter at scale)
- minhash LSH    probabilistic candidate generation: shingle -> minhash
                 signature -> band buckets -> bucket join; linear scans,
                 shuffles only on (band, bucket-hash)
- simhash        near-dup via Hamming-close fingerprints (bit-agreement
                 majority over token hashes)
- embedding      cosine near-dup over vector columns (see similarity.py)

Hash discipline (operators/hashing.py): every digest is taken over an
explicit UTF-8 string and selected by ``hash_fn`` — ``"xxhash64"``
(default, JVM-native, 8-byte keys; the production mode — digests are the
dominant CPU term at 100 TB) or ``"md5"`` (oracle mode: DuckDB recomputes
the exact same buckets, which is how the gates verify value-for-value;
deterministic across runs and cluster sizes in both modes). Exact
identity uses the collision-safe 128-bit :func:`hashing.digest128` —
a lone 64-bit key would spuriously merge ~1e4 distinct docs at 10^12
rows (birthday bound).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tab2neo_spark.operators.hashing import (
    digest,
    digest128,
    ngram_digest,
    ngram_positions,
    word_hashes,
)


# -- exact ---------------------------------------------------------------


def dedup_exact(
    df: DataFrame, content_col: str, id_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Keep the min-id representative per exact content value.

    GroupBy on a short digest, not the content: the shuffle moves 16-32
    byte keys instead of document bodies. The key is 128-bit in BOTH
    modes (md5, or a salted xxhash64 pair) — exact identity must not
    inherit the 64-bit birthday bound."""
    return (
        df.withColumn("__h", digest128(F.col(content_col), hash_fn))
        .groupBy("__h")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__h")
    )


# -- shingles -------------------------------------------------------------


def word_shingles(
    df: DataFrame, content_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Distinct (id, shingle) pairs; shingle = k consecutive lowercased
    words joined by one space. Pure JVM expressions (split/sequence/
    transform/explode) — a narrow, codegen'd stage."""
    words = F.split(F.lower(F.col(content_col)), r"[^a-z0-9]+")
    words = F.filter(words, lambda w: w != "")
    # projection boundary: the word array must be MATERIALIZED before the
    # slice lambda references it — inlined, Catalyst re-evaluates the whole
    # split/lower/filter once per position and the pass goes O(len·k) ->
    # O(len²) (the decontam/_ngram_digests trap; docs/PLANS.md §17)
    step = df.select(F.col(id_col), words.alias("_w"))
    w = F.col("_w")
    shingles = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - k, F.lit(0))),
        lambda i: F.array_join(F.slice(w, i + 1, k), " "),
    )
    shingles = F.when(F.size(w) >= k, shingles).otherwise(F.array())
    return (
        step.select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (a < b, jaccard >= threshold).

    Self-join on shingle -> common-shingle counts; |A|,|B| from per-doc
    sizes; J = common / (|A|+|B|-common).  Exact but quadratic in shingle
    frequency: at corpus scale run it only on LSH candidates
    (:func:`minhash_lsh_candidates`) — kept standalone so the oracle can
    verify it independently."""
    sh = word_shingles(df, content_col, id_col, k).cache()
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    na = sizes.select(F.col(id_col).alias("a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("b"), F.col("n").alias("nb"))
    return (
        common.join(na, "a")
        .join(nb, "b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# -- MinHash + LSH ---------------------------------------------------------


def _minhash_wide(
    shingles: DataFrame, id_col: str, num_hashes: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, _m0.._m{n-1}): per-seed minhash minima as WIDE columns in one
    ``groupBy(id)`` pass — no seed explode (the row count stays at the
    shingle count instead of num_hashes times it) and no second
    per-(id, seed) shuffle. The md5 mode's ``min(string)`` buffers force
    a sort-based aggregate either way; here the sort runs over 1x rows
    keyed by id alone. Seeds are compile-time literals of the SAME types
    the exploded form produced (int seed, ``concat_ws`` casting), so the
    digests — and therefore the minima — are bit-identical."""
    if hash_fn == "xxhash64":
        # hash each shingle's TEXT once (projection boundary), combine
        # with the seed numerically: the same construction the streaming
        # signature expression uses, so batch and stream signatures stay
        # asserted-identical
        base = shingles.select(
            id_col, F.xxhash64(F.col("shingle")).alias("_sh")
        )
        mins = [
            F.min(F.xxhash64(F.col("_sh"), F.lit(s))).alias(f"_m{s}")
            for s in range(num_hashes)
        ]
    else:
        base = shingles
        mins = [
            F.min(
                digest(F.concat_ws("#", F.col("shingle"), F.lit(s)), hash_fn)
            ).alias(f"_m{s}")
            for s in range(num_hashes)
        ]
    return base.groupBy(id_col).agg(*mins)


def minhash_signatures(
    shingles: DataFrame, id_col: str, num_hashes: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, seed, minhash): minhash_s = min over shingles of
    hash(shingle || '#' || s).

    Computed wide (:func:`_minhash_wide`) then unpivoted with one
    doc-scale posexplode — the explode multiplies num_hashes tiny rows
    per document AFTER aggregation, not per shingle before it.
    num_hashes seeds are generated by literal suffixing — no RNG,
    identical on any engine. The two hash modes order values differently
    (numeric vs hex lexicographic) so they select different — equally
    valid — minima; candidates are mode-consistent, never mode-mixed."""
    wide = _minhash_wide(shingles, id_col, num_hashes, hash_fn)
    arr = F.array(*[F.col(f"_m{s}") for s in range(num_hashes)])
    return wide.select(
        F.col(id_col), F.posexplode(arr).alias("seed", "minhash")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    hash_fn: str = "xxhash64",
    shingles: DataFrame | None = None,
) -> DataFrame:
    """Candidate near-dup pairs (a < b) sharing at least one LSH band.

    band value = digest of the band's concatenated minhashes, computed
    IN-ROW from the wide signature (:func:`_minhash_wide`): the whole
    scan -> shingle explode -> digest -> min pipeline is one linear pass
    ending in a single groupBy(id) shuffle — no per-(id, seed) second
    shuffle, no collect_list band aggregate. Docs bucket-join on
    (band_idx, band_value); the join is equi on a digest —
    broadcast-able per bucket, AQE-splittable when a bucket is hot
    (boilerplate pages). The (id, band, band_val) table — num_hashes
    small rows per document — is persisted so the digest pipeline runs
    ONCE, not once per self-join side (the two identical subtrees do not
    reliably collapse to a ReusedExchange). ``shingles`` lets a caller
    that already materialized :func:`word_shingles` (the verify path)
    share it."""
    sh = shingles if shingles is not None else word_shingles(
        df, content_col, id_col, k
    )
    wide = _minhash_wide(sh, id_col, num_hashes, hash_fn)
    rows_per_band = num_hashes // bands
    # per band: minhashes cast to string in seed order, '|'-joined, then
    # digested — byte-identical to the old sort_array(collect_list)
    # construction (seed order is the sort order; no NULL minima reach
    # the join because empty-shingle docs never leave the explode)
    # group seeds exactly as the old (seed // rows_per_band) banding did:
    # ceil(num_hashes / rows_per_band) groups, the last possibly short
    n_groups = -(-num_hashes // rows_per_band)
    band_structs = [
        F.struct(
            F.lit(b).cast("int").alias("band"),
            digest(
                F.concat_ws(
                    "|",
                    *[
                        F.col(f"_m{s}").cast("string")
                        for s in range(
                            b * rows_per_band,
                            min((b + 1) * rows_per_band, num_hashes),
                        )
                    ],
                ),
                hash_fn,
            ).alias("band_val"),
        )
        for b in range(n_groups)
    ]
    banded = wide.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("_bv")
    ).select(F.col(id_col), F.col("_bv.band"), F.col("_bv.band_val"))
    banded = banded.persist()
    L = banded.select(F.col(id_col).alias("a"), "band", "band_val")
    R = banded.select(F.col(id_col).alias("b"), "band", "band_val")
    return (
        L.join(R, ["band", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """LSH candidates verified with exact Jaccard — the full scale path:
    linear candidate generation, quadratic verification only inside
    buckets.

    The distinct (id, shingle) table feeds FOUR consumers (signatures,
    per-doc sizes, both sides of the common-shingle join), so it is
    persisted (memory-and-disk) and shared — one tokenize+explode+
    distinct pass instead of four. At corpus scale the persisted table
    is token-scale; the alternative is four full scan+shuffle passes."""
    sh = word_shingles(df, content_col, id_col, k).persist()
    cand = minhash_lsh_candidates(
        df, content_col, id_col, k, num_hashes, bands, hash_fn,
        shingles=sh,
    )
    # verification via per-doc sorted shingle-SET arrays joined onto the
    # pair ids: |A ∩ B| = size(array_intersect) in-row, |A|/|B| = the
    # array sizes. The old shape exploded cand x A's shingles (pairs x
    # doc-length rows) through a (b, shingle) shuffle join plus a
    # groupBy(a, b) plus two size joins; this one moves only the pair
    # ids and two doc-set tables (AQE broadcasts them when small), and
    # the dense-bucket pair blowup never multiplies by shingle count.
    # Counts are the exact same integers — intersect over distinct
    # shingle strings, no digests involved.
    doc_sets = sh.groupBy(id_col).agg(
        F.sort_array(F.collect_list("shingle")).alias("_set")
    )
    a_sets = doc_sets.select(
        F.col(id_col).alias("a"), F.col("_set").alias("_aset")
    )
    b_sets = doc_sets.select(
        F.col(id_col).alias("b"), F.col("_set").alias("_bset")
    )
    scored = (
        cand.join(a_sets, "a")
        .join(b_sets, "b")
        # projection boundary: common is consumed twice by the jaccard
        # arithmetic below (lambda-CSE discipline, docs/PLANS.md §17)
        .select(
            "a",
            "b",
            F.size(F.array_intersect("_aset", "_bset")).alias("common"),
            F.size("_aset").alias("na"),
            F.size("_bset").alias("nb"),
        )
    )
    return (
        scored
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 6).alias("jaccard"))
    )


# -- SimHash ----------------------------------------------------------------


def simhash(
    df: DataFrame,
    content_col: str,
    id_col: str,
    bits: int = 16,
    hash_fn: str = "md5",
) -> DataFrame:
    """Per-doc ``bits``-wide SimHash fingerprint as a long.

    Each distinct token votes +1/-1 per bit position (bit b of the
    token's hash); fingerprint bit = majority sign. Entirely aggregate
    expressions — one shuffle on id, partial aggregation applies.

    ``hash_fn``: ``"md5"`` (oracle mode, default) derives the token hash
    from the first 8 hex chars of md5 — SQL-replicable via conv/hex
    arithmetic, but capped at ``bits<=32``. ``"xxhash64"`` (production
    mode, the repo's standard dual-mode split) uses the full 64-bit JVM
    xxhash64 — ``bits<=64``, which is what makes EXACT-recall blocking
    selective at corpus scale (64 bits / 4 blocks = 16-bit keys vs the
    4-bit keys a 16-bit fingerprint leaves)."""
    if hash_fn == "xxhash64":
        if bits > 64:
            raise ValueError("xxhash64 simhash supports bits<=64")
        token_hash = F.xxhash64("word")
    elif hash_fn == "md5":
        if bits > 32:
            raise ValueError(
                "md5 simhash is capped at bits<=32 (8-hex-char prefix); "
                "use hash_fn='xxhash64' for wider fingerprints"
            )
        token_hash = F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long")
    else:
        raise ValueError(f"unknown hash_fn {hash_fn!r}")
    words = F.split(F.lower(F.col(content_col)), r"[^a-z0-9]+")
    words = F.filter(words, lambda w: w != "")
    tok = (
        df.select(F.col(id_col), F.explode(words).alias("word"))
        .distinct()
        .withColumn("h", token_hash)
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*votes)
    # bitwise OR of shifted single bits, not addition: bit 63 as an
    # integer literal would overflow a signed long; OR of disjoint bits
    # is value-identical to the old sum for every bits<=32 fingerprint
    fp = F.lit(0).cast("long")
    for b in range(bits):
        bit = F.when(
            F.col(f"v{b}") > 0,
            F.shiftleft(F.lit(1).cast("long"), b),
        ).otherwise(F.lit(0).cast("long"))
        fp = fp.bitwiseOR(bit)
    return agg.select(F.col(id_col), fp.alias("simhash"))


def simhash_block_widths(bits: int, n_blocks: int) -> list[int]:
    """LSB-first widths splitting ``bits`` into ``n_blocks`` near-equal
    contiguous blocks (first ``bits % n_blocks`` blocks one bit wider) —
    shared by the Spark operator and the SQL oracle renderer so both
    sides block identically."""
    base, rem = divmod(bits, n_blocks)
    return [base + 1 if i < rem else base for i in range(n_blocks)]


def simhash_pairs_from_fps(
    fps: DataFrame,
    id_col: str,
    bits: int,
    max_hamming: int,
    n_blocks: int | None = None,
) -> DataFrame:
    """EXACT-recall near-pair generation over precomputed fingerprints:
    the fingerprint splits into ``n_blocks`` (default ``max_hamming + 1``)
    contiguous bit blocks; by pigeonhole, any pair within Hamming distance
    ``max_hamming`` agrees EXACTLY on at least one block, so the union of
    per-block equi-joins is a complete candidate set — no near pair can be
    missed (the pre-r5 fixed-2-block form guaranteed only d<=1). Each
    block join is an ordinary shuffled equi-join on a small int key;
    verification is one bit_count per candidate.

    SELECTIVITY caveat: exact recall divides the fingerprint into
    max_hamming+1 blocks, so each block key has only 2^(bits/(d+1))
    values — candidates per block grow ~n^2 / 2^width. 16-bit
    fingerprints with d=3 leave 4-bit keys: brute-force all-pairs in
    disguise beyond ~10^5 docs. At corpus scale use wider fingerprints
    (simhash is capped at 32 bits by its md5-prefix portability; a
    64-bit production variant should hash with xxhash64) or accept
    bounded recall via an explicit smaller ``n_blocks``. A warning fires
    when a block is narrower than 12 bits."""
    import warnings

    nb = n_blocks if n_blocks is not None else max_hamming + 1
    if nb > bits:
        # more blocks than bits would make the excess blocks ZERO bits
        # wide: mask (1<<0)-1 = 0 gives every row block key 0 — a silent
        # full cross join regardless of fingerprint content (r5 ADVICE).
        # Clamp so every block is >= 1 bit; pigeonhole completeness
        # survives whenever the clamped count still covers max_hamming+1.
        if bits < max_hamming + 1:
            raise ValueError(
                f"simhash blocking: exact recall at hamming {max_hamming} "
                f"needs {max_hamming + 1} blocks but the fingerprint has "
                f"only {bits} bits — use wider fingerprints"
            )
        warnings.warn(
            f"simhash blocking: n_blocks={nb} > bits={bits} — clamped to "
            f"{bits} one-bit blocks (candidate set unchanged in coverage)",
            stacklevel=2,
        )
        nb = bits
    widths = simhash_block_widths(bits, nb)
    if min(widths) < 12:
        warnings.warn(
            f"simhash blocking: {nb} blocks over {bits} bits leaves a "
            f"{min(widths)}-bit block key (2^{min(widths)} buckets) — "
            "candidate generation is near-quadratic beyond ~1e5 docs; "
            "use wider fingerprints or fewer blocks at corpus scale",
            stacklevel=2,
        )
    shift = 0
    blocked = fps
    for i, w in enumerate(widths):
        blk = F.shiftright(F.col("simhash"), shift).bitwiseAND(F.lit((1 << w) - 1))
        blocked = blocked.withColumn(f"_blk{i}", blk)
        shift += w
    # the fingerprint pipeline feeds BOTH sides of every block join —
    # 2 x n_blocks identical subtrees without this persist (the repeated
    # minhash/repeated-spans lesson: identical subtrees do not reliably
    # collapse to a ReusedExchange). The table is docs-scale (id + a few
    # longs), trivially cacheable at any corpus size.
    blocked = blocked.persist()
    cand = None
    for i in range(nb):
        a = blocked.select(
            F.col(id_col).alias("a"), F.col("simhash").alias("fa"), f"_blk{i}"
        )
        b = blocked.select(
            F.col(id_col).alias("b"), F.col("simhash").alias("fb"), f"_blk{i}"
        )
        part = a.join(b, f"_blk{i}").select("a", "b", "fa", "fb")
        cand = part if cand is None else cand.union(part)
    ham = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    # verify BEFORE dedup: bit_count is one instruction per candidate
    # row, so filtering first shrinks the distinct's shuffle to the true
    # near pairs instead of the full multi-block candidate blowup
    # (identical output set: the predicate is row-wise deterministic)
    return (
        cand.filter(F.col("a") < F.col("b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


def simhash_near_pairs(
    df: DataFrame,
    content_col: str,
    id_col: str,
    bits: int = 16,
    max_hamming: int = 3,
    n_blocks: int | None = None,
    hash_fn: str = "md5",
) -> DataFrame:
    """Pairs whose SimHash Hamming distance <= max_hamming, with EXACT
    recall: ``max_hamming + 1`` candidate blocks (pigeonhole-complete; see
    :func:`simhash_pairs_from_fps`). Production calls at corpus scale
    should pass ``bits=64, hash_fn="xxhash64"`` so the block keys stay
    selective; the md5 default is the SQL-oracle mode."""
    fps = simhash(df, content_col, id_col, bits, hash_fn)
    return simhash_pairs_from_fps(fps, id_col, bits, max_hamming, n_blocks)


def repeated_ngram_spans(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 20,
    min_count: int = 2,
    hash_fn: str = "xxhash64",
    digest_bits: int = 64,
    with_doc_counts: bool = True,
) -> DataFrame:
    """Exact repeated-substring detection — the fixed-window n-gram form
    of suffix-array training-data dedup (the "remove ≥k-token substrings
    that appear twice in the corpus" recipe): every token position whose
    ``n``-token window occurs at least ``min_count`` times corpus-wide is
    a repeated span. Returns ``(id, start_token, n_occurrences,
    n_docs)`` per repeated position (1-based token index; downstream
    merges adjacent positions into maximal spans and cuts them from the
    training text).

    Scale shape: tokenize + slide are scan-fused JVM expressions (same
    [^a-z0-9]+ discipline as the rest of the family); ONE shuffle on the
    8-byte window digest for the occurrence count (partial-aggregated);
    one digest-keyed join back to positions. Text never shuffles. A
    boilerplate window repeated millions of times is one hot digest key —
    AQE skew-join handles the join-back, and the count side is a plain
    aggregate (no row explosion).

    ``with_doc_counts=False`` drops the ``n_docs`` column (NULL) and with
    it the ``count_distinct(id)`` aggregation, HALVING the shuffle-side
    aggregation state: count_distinct expands to a distinct pre-agg over
    (digest, id) pairs — at 10M docs that is ~400M state entries, the
    dominant memory term of the whole chain (measured: the 10M-page
    headroom run's spill source). Callers that only need the >=min_count
    decision (the destructive cut path) should pass False."""
    # an under-split input (single-row-group file) would run the whole
    # tokenize+digest+explode map side in ONE task; balance up to default
    # parallelism first (no-op on real many-row-group inputs)
    from tab2neo_spark.session import ensure_min_partitions

    df = ensure_min_partitions(df)
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda w: w != ""
    )
    if hash_fn == "xxhash64":
        # hash-combine form (operators/hashing.py helpers: 7-9x cheaper
        # than per-position string building; the _wh projection boundary
        # is load-bearing against Catalyst re-inlining). digest_bits=128
        # (salted pair) for callers whose decision is DESTRUCTIVE
        # (remove_repeated_regions) — a lone 64-bit key spuriously
        # collides at 1e12 positions.
        base = df.select(F.col(id_col), word_hashes(words).alias("_wh"))
        ngram = lambda i: ngram_digest(  # noqa: E731
            F.col("_wh"), i, n, bits=digest_bits
        )
        src_col = "_wh"
    else:
        base = df.select(F.col(id_col), words.alias("_ws"))
        ngram = lambda i: digest(  # noqa: E731
            F.array_join(F.slice(F.col("_ws"), i, n), " "), hash_fn
        )
        src_col = "_ws"
    idx = ngram_positions(F.col(src_col), n)
    span = F.explode(
        F.transform(
            idx,
            lambda i: F.struct(i.alias("start_token"), ngram(i).alias("_dg")),
        )
    )
    spans = base.select(F.col(id_col), span.alias("s")).select(
        id_col, "s.start_token", "s._dg"
    )
    if with_doc_counts:
        # Single-explosion shape (r6): the naive `spans ⋈ spans.groupBy`
        # join-back evaluates the tokenize+digest explosion TWICE (Spark
        # shares no subtrees across self-joins) and — worse — the
        # planner's post-explode size estimate is the tiny SCAN size, so
        # it broadcast the heavy position stream as the build side.
        # Aggregating positions per (digest, doc) first costs the same
        # (digest, doc) shuffle the old count_distinct pre-agg already
        # paid, the corpus-wide totals reduce from that small relation,
        # and both join inputs are now shuffle stages whose TRUE runtime
        # sizes AQE sees — the filtered totals side broadcasts, the
        # positions side never does. Output multiset is identical
        # (positions re-explode per doc; n_occurrences = Σ per-doc
        # counts; n_docs = doc count per digest).
        per_doc = spans.groupBy("_dg", id_col).agg(
            F.collect_list("start_token").alias("_pos"),
        )
        # totals derive FROM per_doc (size(_pos) == the per-doc position
        # count), not from a separate count aggregation over spans: with
        # byte-identical aggregation subtrees on both sides of the
        # join-back, Spark's ReuseExchange turns the second
        # scan→tokenize→digest→explode→partial-collect pass into a
        # ReusedExchange — the explosion map side runs ONCE per
        # execution instead of twice (the differing partial aggs
        # [collect_list vs pruned count] defeated reuse before; plan
        # delta: 2 Generate/2 Scan → 1, asserted by
        # test_repeated_spans_explodes_once).
        counts = (
            per_doc.select("_dg", F.size("_pos").alias("_n_in_doc"))
            .groupBy("_dg")
            .agg(
                F.sum("_n_in_doc").cast("long").alias("n_occurrences"),
                F.count("*").alias("n_docs"),
            )
            .filter(F.col("n_occurrences") >= min_count)
        )
        # SHUFFLE_HASH building the totals side: Catalyst's static size
        # estimate of a post-explode subtree is the (tiny) scan size, so
        # left unhinted it BROADCASTS the heavy positions relation — fine
        # at small SFs, a driver-memory hazard as the input grows. The
        # hinted shape is scale-safe: one digest-keyed exchange of each
        # side, hash build over the strictly-smaller filtered totals
        # (counts ⊆ per_doc by construction), no sort of the big side,
        # and AQE skew-split still applies to shuffled hash joins.
        return per_doc.join(counts.hint("shuffle_hash"), "_dg").select(
            id_col,
            F.explode("_pos").alias("start_token"),
            "n_occurrences",
            "n_docs",
        )
    # lean path (the destructive cut): digest-only aggregation state —
    # deliberately NOT the (digest, doc) pre-agg, whose per-entry state
    # is the dominant memory term at 10M+ docs (see docstring)
    counts = (
        spans.groupBy("_dg")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
        .withColumn("n_docs", F.lit(None).cast("long"))
    )
    # same SHUFFLE_HASH rationale as above: never let the static
    # estimate broadcast the raw position stream
    return spans.join(counts.hint("shuffle_hash"), "_dg").select(
        id_col, "start_token", "n_occurrences", "n_docs"
    )


def merge_repeated_spans(spans: DataFrame, id_col: str, n: int) -> DataFrame:
    """Collapse :func:`repeated_ngram_spans` positions into MAXIMAL spans:
    two flagged window starts whose distance is < ``n`` overlap, so a
    chain of near-adjacent positions is one repeated region — the unit a
    cut-the-duplicates pass actually removes. Returns ``(id, start_token,
    end_token)`` with ``end_token`` = last token index (1-based,
    inclusive) covered by the final window of the chain.

    Scale shape: one window partitioned by document id ordered by
    position — per-document state only (positions per doc are bounded by
    its token count), never a corpus-wide window. The gaps-and-islands
    form (lag + cumulative flag sum) is the same shape as sessionize."""
    w = Window.partitionBy(id_col).orderBy("start_token")
    gap = F.col("start_token") - F.lag("start_token").over(w)
    new_span = F.when(gap.isNull() | (gap >= n), 1).otherwise(0)
    grouped = spans.select(id_col, "start_token").withColumn(
        "_grp", F.sum(new_span).over(w)
    )
    return (
        grouped.groupBy(id_col, "_grp")
        .agg(
            F.min("start_token").alias("start_token"),
            (F.max("start_token") + n - 1).alias("end_token"),
        )
        .drop("_grp")
    )


def remove_repeated_regions(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 20,
    min_count: int = 2,
    hash_fn: str = "xxhash64",
    broadcast_spans: bool = True,
) -> DataFrame:
    """The cut step of substring dedup: drop every token covered by a
    maximal repeated region (:func:`repeated_ngram_spans` ->
    :func:`merge_repeated_spans`) and return the surviving normalized
    token stream — ``(id, kept_text, n_kept, n_removed)``. Documents with
    no repeats pass through whole.

    Scale shape: the span list per document is tiny (a few ints per
    doc-with-repeats); with ``broadcast_spans=True`` (default) it joins
    back as a BROADCAST side so the corpus text NEVER shuffles
    (plan-tested). When the span table outgrows broadcast limits (a
    corpus where most documents carry repeats), pass False and accept
    one co-partitioning shuffle of (id, spans)+(id, text) — at that
    point moving the text is inherent to the cut. The coverage test is
    a fused array expression computed ONCE behind a projection boundary
    (Catalyst does not CSE lambda expressions). Output
    text is the lowercase [^a-z0-9]+ token stream (the unit the digests
    are defined over) — raw-byte-preserving cuts would need char offsets,
    which the normalized tokenization deliberately discards."""
    spans = merge_repeated_spans(
        repeated_ngram_spans(
            df, text_col, id_col, n, min_count, hash_fn,
            # the cut is DESTRUCTIVE: 128-bit digests so a 64-bit birthday
            # collision can never delete unique text (hashing.ngram_digest)
            digest_bits=128,
            # the cut only needs the >=min_count decision; dropping the
            # count_distinct(id) halves the digest-agg state (the dominant
            # memory term at 10M+ docs — see repeated_ngram_spans)
            with_doc_counts=False,
        ),
        id_col,
        n,
    )
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_token", "end_token")).alias("_spans")
    )
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"), lambda w: w != ""
    )
    if broadcast_spans:
        per_doc = F.broadcast(per_doc)
    joined = df.join(per_doc, on=id_col, how="left").select(
        F.col(id_col),
        words.alias("_ws"),
        F.coalesce(
            F.col("_spans"),
            F.array().cast("array<struct<start_token:int,end_token:int>>"),
        ).alias("_spans"),
    )
    covered = lambda i: F.exists(  # noqa: E731 — 1-based token position i
        F.col("_spans"),
        lambda s: (i >= s["start_token"]) & (i <= s["end_token"]),
    )
    # the O(tokens x spans) coverage scan runs ONCE: _kept sits behind a
    # projection boundary so the three outputs below don't re-expand it
    # (Catalyst does not CSE lambda-bearing expressions — CLAUDE.md)
    kept_step = joined.select(
        F.col(id_col),
        F.size("_ws").alias("_n_all"),
        F.filter(F.col("_ws"), lambda w, i: ~covered(i + 1)).alias("_kept"),
    )
    return kept_step.select(
        F.col(id_col),
        F.array_join("_kept", " ").alias("kept_text"),
        F.size("_kept").alias("n_kept"),
        (F.col("_n_all") - F.size("_kept")).alias("n_removed"),
    )


def dedup_keep_canonical(
    df: DataFrame,
    content_col: str,
    id_col: str,
    k: int = 1,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Corpus-dedup capstone: one canonical survivor per near-dup CLUSTER.

    Pipeline: MinHash-LSH verified pairs (:func:`minhash_dedup_pairs`) ->
    connected components (hash-min + pointer jumping, kg/canon.py) ->
    every document maps to its cluster's minimum id (itself when unique).
    Downstream keeps rows where ``canonical_id = id`` — the standard
    keep-one-per-cluster step after pairwise near-dup detection at corpus
    scale. Returns ``(id_col, canonical_id)`` for EVERY input document.
    """
    from tab2neo_spark.kg.canon import components_adaptive

    pairs = minhash_dedup_pairs(
        df, content_col, id_col, k=k, num_hashes=num_hashes,
        bands=bands, threshold=threshold, hash_fn=hash_fn,
    )
    comp = components_adaptive(pairs.select("a", "b"), src="a", dst="b")
    ids = df.select(F.col(id_col))
    return ids.join(comp, ids[id_col] == comp["id"], "left").select(
        F.col(id_col),
        F.coalesce(F.col("component"), F.col(id_col)).alias("canonical_id"),
    )
