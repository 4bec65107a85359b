"""Pinned-text generator for k-channel Markov removal-effect
attribution (the r14 verdict's generalization ask).

``markov_attribution`` (plans/analytics14.py) solved the 2-transient-
channel absorption system with hand-written closed-form text. This
module generates the SAME family of expressions for ANY k >= 1 by
unrolled Cramer elimination over the k x k transition-count matrix --
Leibniz permutation expansion, exact for the small fixed k both keys
use (the association_rules/PCA-deflation discipline: loop-free pinned
text shared VERBATIM by the Spark plan and the DuckDB oracle, so every
IEEE operation matches bit-for-bit between engines).

Model (Anderl et al. removal-effect attribution): transient states
START and channels 0..k-1, absorbing CONV, terminal NULL. With
counters

  ns[i]   START -> channel i          n_sc  START -> CONV
  nt[i,j] channel i -> channel j      nc[i] channel i -> CONV
  ne[i]   effective out-mass of channel i (row total, or 1 when the
          channel is unused -- the unit-out-mass totalization)

the absorption probabilities u_i solve the Z-matrix system

  ne[i] * u_i - sum_j nt[i,j] * u_j = nc[i]

emitted as Cramer fractions u_i = NUM_i / D over a SHARED determinant
D (all in DOUBLE; counts are exact BIGINTs < 2^53 far past 100 TB).
Removal of channel r redirects every transition into r to NULL and
re-solves the (k-1)-subsystem; the survival ratio is

  u_S(-r) / u_S = (V_r * D) / (D_r * U)

with V_r = sum_{j != r} ns[j] * NUM_j^(r) + n_sc * D_r, exactly the
r14 2-channel shape (there D_r is the other channel's 1x1 out-mass).

Guards: `__u > 0 AND __d > 0` suffices at EVERY k. A is a weakly
diagonally dominant Z-matrix, so det(A) > 0 makes it a nonsingular
M-matrix whose principal minors -- every removal subsystem det D_r --
are all positive; a closed sub-cycle that would make a D_r singular
zeroes the full det first, and the guard already reports NULL there
(degenerate lakes never raise). The generated k=2 text therefore
evaluates bit-for-bit like the r14 constants (pytest-pinned over
randomized and degenerate counter grids, tests/test_markov_general.py).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field


def _perm_sign(perm: tuple[int, ...]) -> int:
    inv = sum(
        1
        for i in range(len(perm))
        for j in range(i + 1, len(perm))
        if perm[i] > perm[j]
    )
    return -1 if inv % 2 else 1


def _det_text(entries: list[list[tuple[int, str]]]) -> str:
    """Leibniz-expansion text of a matrix of (sign, symbol) entries.

    Terms iterate permutations in lexicographic order (identity
    first); factors within a term follow row order -- for 2x2 systems
    this reproduces the r14 hand-written term ORDER, and double
    multiplication is commutative bit-for-bit so factor order never
    changes values. 1x1 dets emit as a bare CAST (no parens), matching
    how the r14 text inlined `nb_eff`.
    """
    n = len(entries)
    terms: list[tuple[int, list[str]]] = []
    for perm in itertools.permutations(range(n)):
        sign = _perm_sign(perm)
        syms: list[str] = []
        for i in range(n):
            s, sym = entries[i][perm[i]]
            sign *= s
            syms.append(sym)
        terms.append((sign, syms))
    parts: list[str] = []
    for idx, (sign, syms) in enumerate(terms):
        prod = " * ".join(f"CAST({s} AS DOUBLE)" for s in syms)
        if idx == 0:
            parts.append(prod if sign > 0 else f"-{prod}")
        else:
            parts.append(("+ " if sign > 0 else "- ") + prod)
    body = " ".join(parts)
    if n == 1:
        return body
    return f"({body})"


@dataclass
class MkNames:
    """Symbol/alias names the generator substitutes into the text.

    ``ne``/``ns``/``nc`` are per-channel counter column names;
    ``nt[(i, j)]`` names the i -> j transition counter; the aliases
    name the staged intermediate columns both engines compute.
    """

    ne: list[str]
    ns: list[str]
    nc: list[str]
    nt: dict[tuple[int, int], str]
    n_sc: str = "n_sc"
    n_s: str = "n_s"
    d_alias: str = "__d"
    u_alias: str = "__u"
    num_alias: list[str] = field(default_factory=list)
    v_alias: list[str] = field(default_factory=list)

    def __post_init__(self) -> None:
        k = len(self.ne)
        if not self.num_alias:
            self.num_alias = [f"__num{i}" for i in range(k)]
        if not self.v_alias:
            self.v_alias = [f"__v{i}" for i in range(k)]


def _system(names: MkNames, chans: list[int]) -> list[list[tuple[int, str]]]:
    """(sign, symbol) matrix of the absorption system restricted to
    ``chans`` (the full system, or a removal subsystem)."""
    return [
        [
            (1, names.ne[i]) if i == j else (-1, names.nt[(i, j)])
            for j in chans
        ]
        for i in chans
    ]


def _replace_col(
    mat: list[list[tuple[int, str]]],
    col: int,
    rhs: list[tuple[int, str]],
) -> list[list[tuple[int, str]]]:
    return [
        [rhs[i] if j == col else mat[i][j] for j in range(len(mat))]
        for i in range(len(mat))
    ]


def mk_attr_exprs(names: MkNames) -> dict:
    """Generate the full pinned-text expression set for k channels.

    Returns d / num[i] / u / v[i] / dr[i] / removal[i] / credit[i] /
    p_conv texts; the caller stages d+num+v as columns, then u, then
    the CASE-guarded e6 reports -- the exact r14 pipeline shape.
    """
    k = len(names.ne)
    chans = list(range(k))
    full = _system(names, chans)
    rhs = [(1, names.nc[i]) for i in chans]
    d = _det_text(full)
    num = [
        _det_text(_replace_col(full, c, rhs)) for c in range(k)
    ]
    u = (
        "("
        + " + ".join(
            f"CAST({names.ns[i]} AS DOUBLE) * {names.num_alias[i]}"
            for i in chans
        )
        + f" + CAST({names.n_sc} AS DOUBLE) * {names.d_alias})"
    )
    v: list[str] = []
    dr: list[str] = []
    for r in chans:
        sub = [i for i in chans if i != r]
        mat = _system(names, sub)
        sub_rhs = [(1, names.nc[i]) for i in sub]
        d_r = _det_text(mat)
        dr.append(d_r)
        terms = [
            f"CAST({names.ns[i]} AS DOUBLE) * "
            + _det_text(_replace_col(mat, c, sub_rhs))
            for c, i in enumerate(sub)
        ]
        terms.append(f"CAST({names.n_sc} AS DOUBLE) * {d_r}")
        v.append("(" + " + ".join(terms) + ")")
    # No per-removal det guard is needed at ANY k: A is a weakly
    # diagonally dominant Z-matrix (A = sI - B, B >= 0, row sums of B
    # <= diagonal), so rho(B) <= s and det(A) > 0 forces rho(B) < s --
    # a nonsingular M-matrix, ALL of whose principal minors are
    # positive. Every removal subsystem is a principal submatrix, so
    # `__d > 0` (the existing guard) already implies every D_r > 0;
    # a closed sub-cycle that would make a removal subsystem singular
    # makes the FULL det 0 first (pytest-evidenced over random k=3
    # grids, tests/test_markov_general.py). This also keeps the
    # generated guard text identical to the r14 k=2 constants.
    ratio = [
        f"({names.v_alias[r]} * {names.d_alias}"
        f" / ({dr[r]} * {names.u_alias}))"
        for r in chans
    ]
    re = [f"(CAST(1 AS DOUBLE) - {ratio[r]})" for r in chans]
    re_sum = "(" + " + ".join(re) + ")"
    base_guard = f"{names.u_alias} > 0 AND {names.d_alias} > 0"
    removal = [
        f"CASE WHEN {base_guard} THEN "
        f"CAST(floor({re[r]} * 1000000 + 0.5) AS BIGINT) END"
        for r in chans
    ]
    credit = [
        f"CASE WHEN {base_guard} AND {re_sum} > 0 THEN "
        f"CAST(floor({re[r]} / {re_sum} * 1000000 + 0.5)"
        " AS BIGINT) END"
        for r in chans
    ]
    p_conv = (
        f"CASE WHEN {names.n_s} > 0 AND {names.d_alias} > 0 THEN "
        f"CAST(floor({names.u_alias}"
        f" / (CAST({names.n_s} AS DOUBLE) * {names.d_alias})"
        " * 1000000 + 0.5) AS BIGINT)"
        f" WHEN {names.n_s} > 0 THEN "
        f"CAST(floor(CAST({names.n_sc} AS DOUBLE)"
        f" / CAST({names.n_s} AS DOUBLE)"
        " * 1000000 + 0.5) AS BIGINT) END"
    )
    return {
        "d": d,
        "num": num,
        "u": u,
        "v": v,
        "dr": dr,
        "removal": removal,
        "credit": credit,
        "p_conv": p_conv,
    }


def legacy_two_channel_names() -> MkNames:
    """The r14 hand-written symbol set, so markov_attribution's k=2
    plan keeps its exact column vocabulary."""
    return MkNames(
        ne=["na_eff", "nb_eff"],
        ns=["n_sa", "n_sb"],
        nc=["n_ac", "n_bc"],
        nt={(0, 1): "n_ab", (1, 0): "n_ba"},
        num_alias=["__anum", "__bnum"],
        v_alias=["__va", "__vb"],
    )
