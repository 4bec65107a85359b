"""Deterministic, cross-engine-reproducible text hashing primitives.

Everything here is expressible BOTH as Spark SQL expressions (JVM-side,
whole-stage codegen -- no Python in the hot path) and as DuckDB SQL, so
the correctness oracle can replay the exact same math. That rules out
engine-native hashes (xxhash64, DuckDB hash()) for oracle-checked paths;
instead we use a 31-base polynomial rolling hash mod p = 2^31-1, the same
family as Java String.hashCode, whose intermediate values stay < 2^62
(safe under ANSI BIGINT arithmetic in both engines).

MinHash permutations h_i(x) = (a_i * x + b_i) mod p use seed constants
generated HERE in Python and inlined as literals into both the Spark
expression and the oracle SQL -- consistency by construction.
"""

from __future__ import annotations

P = 2147483647  # 2^31 - 1 (Mersenne prime)
MINHASH_K = 64
LSH_BANDS = 16
LSH_ROWS = 4  # BANDS * ROWS == MINHASH_K; s-curve threshold ~ (1/16)^(1/4) ~ 0.5
SIMHASH_BITS = 48  # < 63 so the fingerprint fits a signed BIGINT under ANSI
SIMHASH_BANDS = 4  # 4 bands x 12 bits: pigeonhole-exact for hamming <= 3


def perm_seeds(k: int = MINHASH_K) -> tuple[list[int], list[int]]:
    """Deterministic LCG-derived (a_i, b_i) for the minhash family."""
    a = [((1664525 * (i + 1) + 1013904223) % (P - 1)) + 1 for i in range(k)]
    b = [(22695477 * (i + 1) + 12345) % P for i in range(k)]
    return a, b


def _arr(vals: list[int]) -> str:
    return "array(" + ",".join(str(v) for v in vals) + ")"


def _list(vals: list[int]) -> str:
    return "[" + ",".join(str(v) for v in vals) + "]"


# ------------------------------------------------------------------ Spark SQL
# (strings for F.expr -- kept as expressions so Catalyst codegens them)

def sp_tokens(col: str = "text") -> str:
    return f"split(trim({col}), '\\\\s+')"


def sp_shingle_hashes_from_tokens(tok: str, n: int = 3) -> str:
    """Distinct word n-gram shingles as 64-BIT HASHES from an
    already-tokenized array column: gram = xxhash64(token slice), whole
    doc hashed when shorter than n tokens.

    The engine never needs the gram STRING -- join keys, minhash
    permutations, and exact-jaccard verification all consume the hash --
    and hashing the slice directly skips building one string per gram
    (array_join + copy), which dominated shingling cost (~4s -> ~1s for
    5k docs at sf0.1). Collision odds for 64-bit grams are ~m^2/2^65 --
    negligible against the driver oracle's corpus sizes -- and jaccard
    over distinct gram hashes equals jaccard over distinct grams
    whenever no collision occurs."""
    grams = (
        f"transform(sequence(0, size({tok}) - {n}), "
        f"i -> xxhash64(slice({tok}, i + 1, {n})))"
    )
    return (
        f"CASE WHEN size({tok}) >= {n} THEN array_distinct({grams}) "
        f"ELSE array(xxhash64({tok})) END"
    )


def sp_shingles(col: str = "text", n: int = 3) -> str:
    """Distinct word n-gram shingles; whole text as one shingle when the
    doc is shorter than n tokens."""
    t = sp_tokens(col)
    grams = (
        f"transform(sequence(0, size({t}) - {n}), "
        f"i -> array_join(slice({t}, i + 1, {n}), ' '))"
    )
    return (
        f"CASE WHEN size({t}) >= {n} THEN array_distinct({grams}) "
        f"ELSE array(array_join({t}, ' ')) END"
    )


def sp_polyhash(expr: str) -> str:
    """Polynomial hash of a string expression -> BIGINT in [0, p)."""
    return (
        f"aggregate(transform(split({expr}, ''), c -> ascii(c)), "
        f"0L, (acc, x) -> (acc * 31 + x) % {P}L)"
    )


def sp_polyhash_list(expr: str) -> str:
    """Polynomial hash of a BIGINT array expression (order-sensitive)."""
    return f"aggregate({expr}, 0L, (acc, x) -> (acc * 31 + x) % {P}L)"


def sp_shingle_hashes(shingles_expr: str) -> str:
    """Polyhash each shingle -- materialize THIS as a column before
    building the minhash, so the char-level hashing runs once per shingle
    instead of once per (shingle x permutation)."""
    return f"transform({shingles_expr}, s -> {sp_polyhash('s')})"


def sp_minhash(hashes_col: str, k: int = MINHASH_K) -> str:
    """k-element minhash signature from a precomputed BIGINT-array column
    of shingle hashes (k x |shingles| multiply-mod ops per row, all JVM)."""
    a, b = perm_seeds(k)
    return (
        f"transform(sequence(0, {k - 1}), i -> "
        f"array_min(transform({hashes_col}, h -> "
        f"(element_at({_arr(a)}, i + 1) * h + element_at({_arr(b)}, i + 1)) % {P}L)))"
    )


def sp_band_sigs(mh_expr: str, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> str:
    """Array of per-band signatures (polyhash of each r-slice)."""
    return (
        f"transform(sequence(0, {bands - 1}), bnd -> "
        f"{sp_polyhash_list(f'slice({mh_expr}, bnd * {rows} + 1, {rows})')})"
    )


def sp_token_hashes(tokens_expr: str) -> str:
    return f"transform({tokens_expr}, t -> {sp_polyhash('t')})"


def sp_gram_hashes_from_token_hashes(th_col: str, n: int = 3) -> str:
    """Distinct word n-gram hashes from a MATERIALIZED token-hash array
    column: each gram hash polynomial-folds its n token hashes, so the
    char-level hashing runs once per TOKEN (in the column feeding
    ``th_col``), not once per (gram x token), and no gram string is ever
    built (array_join + copy dominated the string path). Whole doc = one
    gram when shorter than n tokens. Exact twin: dk_gram_hashes_from_
    token_hashes. Distinctness is over gram-hash values -- identical
    math both engines, so any collision merges identically."""
    gram = sp_polyhash_list(f"slice({th_col}, i + 1, {n})")
    return (
        f"CASE WHEN size({th_col}) >= {n} THEN array_distinct("
        f"transform(sequence(0, size({th_col}) - {n}), i -> {gram})) "
        f"ELSE array({sp_polyhash_list(th_col)}) END"
    )


def sp_simhash(th: str, bits: int = SIMHASH_BITS) -> str:
    """SimHash from a precomputed token-hash array column (materialize the
    hashes once -- the per-bit vote re-references the array, not the
    char-level hashing): bit b set iff sum over tokens of
    (+1 if bit b of hash(token) else -1) > 0."""
    bit_vote = (
        f"aggregate({th}, 0L, (acc, h) -> "
        f"acc + CASE WHEN shiftright(h, b) % 2 = 1 THEN 1L ELSE -1L END)"
    )
    return (
        f"aggregate(transform(sequence(0, {bits - 1}), b -> "
        f"CASE WHEN ({bit_vote}) > 0 THEN shiftleft(1L, b) ELSE 0L END), "
        f"0L, (acc, x) -> acc + x)"
    )


def sp_dot(a: str, b: str) -> str:
    """Double-precision dot product, sequential summation."""
    da = f"transform({a}, x -> cast(x as double))"
    db = f"transform({b}, x -> cast(x as double))"
    return (
        f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"
    )


def sp_l2sq(a: str, b: str) -> str:
    """Squared L2 distance, sequential summation -- the PQ encoding
    metric; term shape (x - y) * (x - y) matches dk_l2sq exactly."""
    da = f"transform({a}, x -> cast(x as double))"
    db = f"transform({b}, x -> cast(x as double))"
    return (
        f"aggregate(zip_with({da}, {db}, (x, y) -> (x - y) * (x - y)), "
        f"0.0D, (s, v) -> s + v)"
    )


def sp_l2sq_res(a: str, b: str, w: str) -> str:
    """Squared L2 between the RESIDUAL (a - b) and codeword w, all in
    double, sequential fold -- the IVFADC encoding metric (Jegou et al.
    2011: PQ runs on residuals to the coarse centroid). Term shape
    t = (x - y); u = t - z; u * u matches dk_l2sq_res exactly, so the
    residual is never materialized as a float array on either side."""
    da = f"transform({a}, x -> cast(x as double))"
    db = f"transform({b}, x -> cast(x as double))"
    dw = f"transform({w}, x -> cast(x as double))"
    return (
        f"aggregate(zip_with(zip_with({da}, {db}, (x, y) -> x - y), {dw}, "
        f"(r, z) -> (r - z) * (r - z)), 0.0D, (s, v) -> s + v)"
    )


def sp_norm(a: str) -> str:
    """L2 norm, identical operation order to the norm inside sp_cosine --
    precompute this per ROW so the per-PAIR hot path runs one aggregate
    (the dot) instead of three; dot/(norm_a*norm_b) is then bit-identical
    to sp_cosine."""
    da = f"transform({a}, x -> cast(x as double))"
    return f"sqrt(aggregate({da}, 0.0D, (s, v) -> s + v * v))"


def sp_cosine(a: str, b: str) -> str:
    """Cosine similarity of two float-array expressions, computed in
    double with sequential summation (same order as the oracle)."""
    da = f"transform({a}, x -> cast(x as double))"
    db = f"transform({b}, x -> cast(x as double))"
    dot = f"aggregate(zip_with({da}, {db}, (x, y) -> x * y), 0.0D, (s, v) -> s + v)"
    na = f"aggregate({da}, 0.0D, (s, v) -> s + v * v)"
    nb = f"aggregate({db}, 0.0D, (s, v) -> s + v * v)"
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


# ------------------------------------------------------------------ DuckDB SQL

def dk_tokens(col: str = "text") -> str:
    return f"regexp_split_to_array(trim({col}), '\\s+')"


def dk_shingles(col: str = "text", n: int = 3) -> str:
    t = dk_tokens(col)
    grams = (
        f"list_transform(range(0, len({t}) - {n} + 1), "
        f"i -> array_to_string(list_slice({t}, i + 1, i + {n}), ' '))"
    )
    return (
        f"CASE WHEN len({t}) >= {n} THEN list_distinct({grams}) "
        f"ELSE [array_to_string({t}, ' ')] END"
    )


def dk_polyhash(expr: str) -> str:
    # unicode('') is -1 in DuckDB but ascii('') is 0 in Spark, and an
    # empty input string splits into [''] in both engines -- clamp so
    # hash('') agrees (found by tests/test_texthash_parity.py).
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(split({expr}, ''), "
        f"c -> greatest(unicode(c), 0)::BIGINT)), "
        f"(acc, x) -> (acc * 31 + x) % {P})"
    )


def dk_polyhash_list(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(0::BIGINT, {expr}), "
        f"(acc, x) -> (acc * 31 + x) % {P})"
    )


def dk_minhash(shingles_expr: str, k: int = MINHASH_K) -> str:
    a, b = perm_seeds(k)
    hashes = f"list_transform({shingles_expr}, s -> {dk_polyhash('s')})"
    return (
        f"list_transform(range(0, {k}), i -> "
        f"list_min(list_transform({hashes}, h -> "
        f"({_list(a)}[i + 1] * h + {_list(b)}[i + 1]) % {P})))"
    )


def dk_minhash_from_hashes(hashes_expr: str, k: int = MINHASH_K) -> str:
    """dk_minhash over an ALREADY-HASHED shingle list column: inlining
    dk_minhash's hash text into the per-permutation lambda re-runs the
    char-level polyhash k times per shingle -- materialize the hash
    list once (a CTE column) and permute that. Identical values to
    sp_minhash over sp_shingle_hashes (same fold, same seeds)."""
    a, b = perm_seeds(k)
    return (
        f"list_transform(range(0, {k}), i -> "
        f"list_min(list_transform({hashes_expr}, h -> "
        f"({_list(a)}[i + 1] * h + {_list(b)}[i + 1]) % {P})))"
    )


def dk_band_sigs(mh_expr: str, bands: int = LSH_BANDS, rows: int = LSH_ROWS) -> str:
    return (
        f"list_transform(range(0, {bands}), bnd -> "
        f"{dk_polyhash_list(f'list_slice({mh_expr}, bnd * {rows} + 1, bnd * {rows} + {rows})')})"
    )


def dk_token_hashes(tokens_expr: str) -> str:
    return f"list_transform({tokens_expr}, t -> {dk_polyhash('t')})"


def dk_gram_hashes_from_token_hashes(th_expr: str, n: int = 3) -> str:
    """DuckDB twin of sp_gram_hashes_from_token_hashes."""
    gram = dk_polyhash_list(f"list_slice({th_expr}, i + 1, i + {n})")
    return (
        f"CASE WHEN len({th_expr}) >= {n} THEN list_distinct("
        f"list_transform(range(0, len({th_expr}) - {n} + 1), i -> {gram})) "
        f"ELSE [{dk_polyhash_list(th_expr)}] END"
    )


def dk_simhash(th: str, bits: int = SIMHASH_BITS) -> str:
    bit_vote = (
        f"list_reduce(list_prepend(0::BIGINT, list_transform({th}, h -> "
        f"CASE WHEN (h >> b) % 2 = 1 THEN 1::BIGINT ELSE -1::BIGINT END)), "
        f"(acc, x) -> acc + x)"
    )
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(range(0, {bits}), b -> "
        f"CASE WHEN ({bit_vote}) > 0 THEN (1::BIGINT << b) ELSE 0::BIGINT END)), "
        f"(acc, x) -> acc + x)"
    )


def dk_dot(a: str, b: str) -> str:
    """Double-precision dot product, same left-fold order as sp_dot
    (the fold inside dk_cosine, exposed standalone)."""
    da = f"list_transform({a}, x -> x::DOUBLE)"
    db = f"list_transform({b}, x -> x::DOUBLE)"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, len({a})), i -> {da}[i + 1] * {db}[i + 1])), "
        f"(s, v) -> s + v)"
    )


def dk_l2sq(a: str, b: str) -> str:
    """Squared L2 distance, same left-fold order and (x - y) * (x - y)
    term shape as sp_l2sq."""
    da = f"list_transform({a}, x -> x::DOUBLE)"
    db = f"list_transform({b}, x -> x::DOUBLE)"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, len({a})), i -> "
        f"({da}[i + 1] - {db}[i + 1]) * ({da}[i + 1] - {db}[i + 1]))), "
        f"(s, v) -> s + v)"
    )


def dk_l2sq_res(a: str, b: str, w: str) -> str:
    """Squared L2 between the residual (a - b) and w, same left-fold
    order and ((x - y) - z) * ((x - y) - z) term shape as sp_l2sq_res."""
    da = f"list_transform({a}, x -> x::DOUBLE)"
    db = f"list_transform({b}, x -> x::DOUBLE)"
    dw = f"list_transform({w}, x -> x::DOUBLE)"
    term = f"(({da}[i + 1] - {db}[i + 1]) - {dw}[i + 1])"
    return (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, len({a})), i -> {term} * {term})), "
        f"(s, v) -> s + v)"
    )


def dk_cosine(a: str, b: str) -> str:
    da = f"list_transform({a}, x -> x::DOUBLE)"
    db = f"list_transform({b}, x -> x::DOUBLE)"
    dot = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform(range(0, len({a})), i -> {da}[i + 1] * {db}[i + 1])), "
        f"(s, v) -> s + v)"
    )
    na = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({da}, v -> v * v)), (s, v) -> s + v)"
    )
    nb = (
        f"list_reduce(list_prepend(0.0::DOUBLE, "
        f"list_transform({db}, v -> v * v)), (s, v) -> s + v)"
    )
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"
