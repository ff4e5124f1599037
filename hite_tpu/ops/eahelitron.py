"""EAHelitron-equivalent Helitron structure scanner (device kernel).

Re-implements the motif semantics of the reference's optional EAHelitron
path (`bin/EAHelitron-master/EAHelitron`, a Perl regex engine; invoked by
HiTE as `EAHelitron -u 20000 -T "ATC" -r 3` from `Util.py:130-196` and
unioned with HelitronScanner candidates in
`module/judge_Helitron_transposons.py:39-54`, default-disabled there).

The structure searched, 5' -> 3':

    [5' motif]  ...  <=upstream bp  ...  [hairpin stem] [loop] [revcomp stem]
                                         [3-12bp] [CT R R T] [>=4bp]

* the hairpin stem is one of 16 degenerate S/W-class patterns (S=[GC],
  W=[AT], lengths 4-7) and its reverse complement must follow after a
  1-9bp loop containing at least one A/T within 4bp of each loop end;
* the 3' terminus is CTRRT at fuzzy level 3 (`CT[AG]{2}T`);
* 10bp of unambiguous sequence must precede the stem and 4 bases must
  follow the terminus;
* every 3' structure pairs with any 5' motif occurrence within
  `upstream` bp; HiTE keeps, per candidate, the pair whose ends lie
  closest to the raw candidate boundaries (`run_EAHelitron`,
  `Util.py:166-195`).

TPU formulation: every check is a static-shift elementwise compare over
the [B, L] code matrix — palindrome compares are precomputed per
center-distance (`pal[m][i] = (c[i] == comp(c[i+m]))`), so each
(stem, loop) combination is an AND of shifted boolean planes; there are
no gathers and no data-dependent shapes.  The Perl engine reports the
first backtracking match and then resumes after it; this kernel marks
ALL satisfying positions (a superset), which is harmless because the
consumer selects one pair by boundary distance.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# base codes (io.fasta): A=0 C=1 G=2 T=3 N=4
_A, _C, _G, _T = 0, 1, 2, 3

# hairpin stem class patterns (EAHelitron $hairpinpattern alternatives),
# S = [GC], W = [AT]
STEM_PATTERNS = (
    "SSSSWS", "SSSWSS", "SSWSSS", "SWSSSS", "SSSSS",
    "SSSSWWS", "SSSWWSS", "SSWWSSS", "SWWSSSS",
    "SWSWSSS", "SWSSWSS", "SWSSSWS", "SSWSWSS", "SSWSSWS", "SSSWSWS",
    "SSSS",
)

# CTRRT fuzzy levels (EAHelitron @CTAGT): each entry is a tuple of
# allowed-base tuples; None = any base
_R = (_A, _G)
CTRRT_LEVELS = (
    ((_C,), (_T,), (_A,), (_G,), (_T,)),          # 0: CTAGT
    ((_C,), (_T,), _R, (_G,), (_T,)),             # 1: CT[AG]GT
    ((_C,), (_T,), (_A,), _R, (_T,)),             # 2: CTA[AG]T
    ((_C,), (_T,), _R, _R, (_T,)),                # 3: CT[AG]{2}T
    ((_C,), (_T,), _R, _R, None),                 # 4: CT[AG]{2}.
    ((_C,), (_T,), (_A,), (_G,), None),           # 5: CTAG.
)

MAX_LOOP = 9      # loop = [atcg]{0,4} [at] [atgc]{0,4}
GAP_MIN, GAP_MAX = 3, 12   # bp between hairpin and CTRRT
LEAD = 10         # unambiguous bp required before the stem
TRAIL = 4         # bases required after the terminus


def _shift(x: jnp.ndarray, d: int, fill):
    """x[:, i] <- x[:, i+d] (d >= 0), tail filled."""
    if d == 0:
        return x
    pad = jnp.full(x.shape[:-1] + (d,), fill, x.dtype)
    return jnp.concatenate([x[..., d:], pad], axis=-1)


def _match_at(c: jnp.ndarray, pattern) -> jnp.ndarray:
    """bool [B, L]: degenerate pattern (tuple of allowed-code tuples or
    None=any unambiguous base) starts at each position."""
    ok = jnp.ones(c.shape, jnp.bool_)
    for j, allowed in enumerate(pattern):
        cj = _shift(c, j, 4)
        if allowed is None:
            ok = ok & (cj < 4)
        else:
            m = jnp.zeros(c.shape, jnp.bool_)
            for b in allowed:
                m = m | (cj == b)
            ok = ok & m
    return ok


@partial(jax.jit, static_argnames=("fuzzy_level",))
def hel3_scan(codes: jnp.ndarray, fuzzy_level: int = 3) -> jnp.ndarray:
    """3' Helitron structure scan.

    codes: uint8/int [B, L].  Returns bool [B, L] marking positions where a
    complete 3' structure's CTRRT terminus STARTS (element 3' end =
    index + 5, exclusive).  Callers must additionally bound end+TRAIL by
    the true sequence length (padding here is N, which [atcgn] accepts).
    """
    c = codes.astype(jnp.int32)
    acgt = c < 4
    is_s = (c == _C) | (c == _G)
    is_w = (c == _A) | (c == _T)

    # palindrome planes: pal[m][i] = c[i] pairs (WC) with c[i+m]
    max_s = max(len(p) for p in STEM_PATTERNS)
    pal = {}
    for m in range(2, MAX_LOOP + 2 * (max_s - 1) + 2):
        cm = _shift(c, m, 4)
        pal[m] = acgt & (cm < 4) & (c == 3 - cm)

    # leading [atcg]{10} ENDING just before position i  <=>  10-run of
    # ACGT starting at i-10: compute run-of-10 then shift left by -10 via
    # right shift of the requirement (evaluate at stem start i: need
    # acgt[i-10..i-1]; equivalently run10[i-10])
    run10 = jnp.ones(c.shape, jnp.bool_)
    for j in range(LEAD):
        run10 = run10 & _shift(acgt, j, False)
    lead_ok = jnp.concatenate(
        [jnp.zeros(c.shape[:-1] + (LEAD,), jnp.bool_), run10[..., :-LEAD]],
        axis=-1)

    ctrrt = _match_at(c, CTRRT_LEVELS[fuzzy_level])

    # mark hairpin END positions (start + 2*stem + loop for every complete
    # stem/loop/revcomp-stem structure) so the terminus test below is a
    # fixed set of static shifts
    hp_end = jnp.zeros(c.shape, jnp.bool_)
    for pat in STEM_PATTERNS:
        s = len(pat)
        stem = jnp.ones(c.shape, jnp.bool_)
        for j, cls in enumerate(pat):
            stem = stem & _shift(is_s if cls == "S" else is_w, j, False)
        stem = stem & lead_ok
        for loop in range(1, MAX_LOOP + 1):
            # loop bases unambiguous, with an A/T within 4bp of both ends
            lo = max(0, loop - 5)
            hi = min(4, loop - 1)
            lok = jnp.ones(c.shape, jnp.bool_)
            wany = jnp.zeros(c.shape, jnp.bool_)
            for a in range(loop):
                lok = lok & _shift(acgt, s + a, False)
                if lo <= a <= hi:
                    wany = wany | _shift(is_w, s + a, False)
            # revcomp stem: c[i+s-1-j] pairs with c[i+s+loop+j]
            rc = jnp.ones(c.shape, jnp.bool_)
            for j in range(s):
                rc = rc & _shift(pal[loop + 2 * j + 1], s - 1 - j, False)
            full = stem & lok & wany & rc
            # scatter to hairpin end = start + 2s + loop (static right shift)
            d = 2 * s + loop
            pad = jnp.zeros(c.shape[:-1] + (d,), jnp.bool_)
            hp_end = hp_end | jnp.concatenate(
                [pad, full[..., :-d]], axis=-1)

    term_ok = jnp.zeros(c.shape, jnp.bool_)
    for g in range(GAP_MIN, GAP_MAX + 1):
        # terminus at t preceded by g ACGT bases preceded by a hairpin end
        rung = jnp.ones(c.shape, jnp.bool_)
        for j in range(g):
            rung = rung & _shift(acgt, j, False)
        pad = jnp.zeros(c.shape[:-1] + (g,), jnp.bool_)
        term_ok = term_ok | jnp.concatenate([pad, (hp_end & rung)[..., :-g]],
                                            axis=-1)
    return term_ok & ctrrt


@jax.jit
def tc5_scan(codes: jnp.ndarray) -> jnp.ndarray:
    """5' motif scan with HiTE's override (-T "ATC"): bool [B, L] of ATC
    start positions with >=5bp context before and >=20bp after (any base,
    EAHelitron `[atgcn]{5}(pat)[atgcn]{20}`) — the bounds are enforced by
    the caller against true lengths; here only the motif is matched."""
    c = codes.astype(jnp.int32)
    return (c == _A) & (_shift(c, 1, 4) == _T) & (_shift(c, 2, 4) == _C)


def select_pairs(
    hel3: np.ndarray,
    tc5: np.ndarray,
    lens: np.ndarray,
    raw_start: np.ndarray,
    raw_end: np.ndarray,
    upstream: int = 20_000,
    min_len: int = 80,
) -> List[Optional[Tuple[int, int]]]:
    """Per-row best (start, end) Helitron span (half-open, row-local).

    Mirrors `run_EAHelitron` (`Util.py:166-195`): every 3' structure pairs
    with each 5' motif within `upstream` bp upstream; keep the pair with
    the smallest |start - raw_start| + |end - raw_end| (ties -> longer).
    """
    out: List[Optional[Tuple[int, int]]] = []
    for r in range(len(lens)):
        L = int(lens[r])
        ends = np.nonzero(hel3[r, :L])[0] + 5          # exclusive ends
        ends = ends[ends + TRAIL <= L]
        starts = np.nonzero(tc5[r, :L])[0]
        starts = starts[(starts >= 5) & (starts + 3 + 20 <= L)]
        best = None
        for e in ends:
            cand = starts[(starts < e - 5) & (starts >= e - upstream)]
            if len(cand) == 0:
                continue
            dists = np.abs(cand - raw_start[r]) + abs(int(e) - raw_end[r])
            order = np.lexsort((cand, dists))          # min dist, then min start (longest)
            s = int(cand[order[0]])
            d = int(dists[order[0]])
            ln = int(e) - s
            if ln < min_len:
                continue
            key = (d, -ln)
            if best is None or key < best[0]:
                best = (key, (s, int(e)))
        out.append(best[1] if best else None)
    return out
