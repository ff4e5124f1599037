"""Helitron terminal scoring: LCV pattern bank as a one-hot conv kernel.

Replaces the HelitronScanner Java pipeline (`bin/HelitronScanner/
HelitronScanner.jar` scanHead/scanTail phases, driven by
`bin/run_helitron_scanner.sh:20-48` and `Util.py:91-113`): Helitron 5'/3'
termini are recognized by banks of trained local-combinational-variable
patterns (`TrainingSet/head.lcvs` / `tail.lcvs` — vendored under
`hite_tpu/data/helitron/`; regex-like strings over {ACGT . [..] .{n} .{a,b}}).

TPU-native design: every pattern (with variable gaps expanded to fixed-gap
variants) becomes a [W, 4] allowed-base mask; a window position matches a
pattern iff <onehot(window), allowed> == n_constrained.  Scoring all
positions against the whole bank is one einsum over (position-window,
pattern) — an MXU matmul — tiled along the sequence.
"""

from __future__ import annotations

import functools
import os
import re
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "data", "helitron")

_TOKEN = re.compile(
    r"(?P<base>[ACGT])"
    r"|(?P<any>\.(?:\{(?P<lo>\d+)(?:,(?P<hi>\d+))?\})?)"
    r"|\[(?P<cls>[ACGT]+)\](?:\{(?P<clo>\d+)(?:,(?P<chi>\d+))?\})?"
)

B2I = {"A": 0, "C": 1, "G": 2, "T": 3}


def _parse_pattern(pat: str) -> List[List[Tuple[str, int, int]]]:
    """Tokenize one LCV pattern into (kind, payload, repeat-range) items."""
    items = []
    pos = 0
    while pos < len(pat):
        m = _TOKEN.match(pat, pos)
        if not m:
            raise ValueError(f"bad LCV pattern {pat!r} at {pos}")
        pos = m.end()
        if m.group("base"):
            items.append(("base", m.group("base"), 1, 1))
        elif m.group("any") is not None:
            lo = int(m.group("lo")) if m.group("lo") else 1
            hi = int(m.group("hi")) if m.group("hi") else lo
            items.append(("any", ".", lo, hi))
        else:
            lo = int(m.group("clo")) if m.group("clo") else 1
            hi = int(m.group("chi")) if m.group("chi") else lo
            items.append(("cls", m.group("cls"), lo, hi))
    return items


def _expand(items, max_variants: int = 16) -> List[List[Tuple[str, str]]]:
    """Expand variable repeats into fixed-width variants (capped)."""
    variants: List[List[Tuple[str, str]]] = [[]]
    for kind, payload, lo, hi in items:
        new = []
        for n in range(lo, hi + 1):
            for v in variants:
                new.append(v + [(kind, payload)] * n)
            if len(new) > max_variants * 4:
                break
        variants = new[: max_variants * 4]
    return variants[:max_variants]


class LCVBank(NamedTuple):
    allowed: np.ndarray      # float32 [P, W, 4] allowed-base indicator
    nconstr: np.ndarray      # int32 [P] constrained positions per pattern
    width: np.ndarray        # int32 [P] pattern width
    group: np.ndarray        # int32 [P] source pattern id (variants share)


def load_bank(path: str, max_width: int = 40) -> LCVBank:
    allowed_rows, nconstr, widths, groups = [], [], [], []
    with open(path) as fh:
        patterns = [l.strip() for l in fh if l.strip()]
    for gid, pat in enumerate(patterns):
        for variant in _expand(_parse_pattern(pat)):
            W = len(variant)
            if W > max_width:
                continue
            row = np.zeros((max_width, 4), np.float32)
            nc = 0
            for w, (kind, payload) in enumerate(variant):
                if kind == "base":
                    row[w, B2I[payload]] = 1.0
                    nc += 1
                elif kind == "cls":
                    for ch in payload:
                        row[w, B2I[ch]] = 1.0
                    nc += 1
                # 'any': all-zero row, not constrained
            allowed_rows.append(row)
            nconstr.append(nc)
            widths.append(W)
            groups.append(gid)
    return LCVBank(
        allowed=np.stack(allowed_rows),
        nconstr=np.array(nconstr, np.int32),
        width=np.array(widths, np.int32),
        group=np.array(groups, np.int32),
    )


@functools.lru_cache(maxsize=None)
def default_banks() -> Tuple[LCVBank, LCVBank]:
    """(head, tail) banks from the vendored HelitronScanner TrainingSet."""
    head = load_bank(os.path.join(DATA_DIR, "head.lcvs"))
    tail = load_bank(os.path.join(DATA_DIR, "tail.lcvs"))
    return head, tail


def _pad_patterns(bank: LCVBank, p_mult: int = 128):
    P = bank.allowed.shape[0]
    P_pad = ((P + p_mult - 1) // p_mult) * p_mult
    allowed = np.zeros((P_pad,) + bank.allowed.shape[1:], np.float32)
    allowed[:P] = bank.allowed
    nconstr = np.full(P_pad, 10**6, np.int32)  # padded patterns never match
    nconstr[:P] = bank.nconstr
    group = np.full(P_pad, -1, np.int32)
    group[:P] = bank.group
    return allowed, nconstr, group


_SCORER_CACHE: dict = {}


def lcv_scores(
    seqs: jnp.ndarray,
    bank: LCVBank,
    *,
    tile: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-position LCV hit counts and matched widths (jitted per bank).

    seqs: uint8 [B, L] codes.  Returns (score int32 [B, L], width int32
    [B, L]) — the number of distinct source patterns with a variant
    matching the window starting at each position (HelitronScanner's
    per-site score) and the widest matching variant (0 when none).
    """
    key = (id(bank), tile)
    fn = _SCORER_CACHE.get(key)
    if fn is None:
        fn = jax.jit(functools.partial(_lcv_scores_impl, bank=bank, tile=tile),
                     static_argnames=())
        _SCORER_CACHE[key] = fn
    return fn(seqs)


def _lcv_scores_impl(seqs: jnp.ndarray, *, bank: LCVBank, tile: int):
    allowed_np, nconstr_np, group_np = _pad_patterns(bank)
    P, W, _ = allowed_np.shape
    allowed = jnp.asarray(allowed_np.reshape(P, W * 4))
    nconstr = jnp.asarray(nconstr_np)
    group = jnp.asarray(group_np)
    widths = jnp.asarray(
        np.concatenate([bank.width, np.zeros(P - len(bank.width), np.int32)]))
    n_groups = int(bank.group.max()) + 1

    B, L = seqs.shape
    oh = jax.nn.one_hot(seqs.astype(jnp.int32), 4, dtype=jnp.float32)  # [B,L,4]
    oh = jnp.pad(oh, ((0, 0), (0, W), (0, 0)))

    # group -> one-hot matrix so variant hits collapse to source patterns
    gmat = jax.nn.one_hot(jnp.clip(group, 0, n_groups - 1), n_groups,
                          dtype=jnp.float32)
    gmat = jnp.where((group >= 0)[:, None], gmat, 0.0)   # [P, G]

    def tile_scores(b_oh, start):
        win = jax.lax.dynamic_slice(b_oh, (start, 0), (tile + W, 4))
        # windows [tile, W, 4] via W shifted slices
        wins = jnp.stack([win[t : t + tile] for t in range(W)], axis=1)
        wins = wins.reshape(tile, W * 4)
        match_counts = jnp.dot(wins, allowed.T,
                               preferred_element_type=jnp.float32)  # [tile, P]
        full = match_counts >= nconstr[None, :].astype(jnp.float32)
        hits = jnp.dot(full.astype(jnp.float32), gmat,
                       preferred_element_type=jnp.float32) > 0    # [tile, G]
        score = jnp.sum(hits, axis=1).astype(jnp.int32)
        width = jnp.max(jnp.where(full, widths[None, :], 0), axis=1)
        return score, width

    n_tiles = (L + tile - 1) // tile
    L_pad = n_tiles * tile
    oh_full = jnp.pad(oh, ((0, 0), (0, L_pad + W - oh.shape[1]), (0, 0)))

    def per_seq(b_oh):
        starts = jnp.arange(n_tiles) * tile
        sc, wd = jax.lax.map(lambda s: tile_scores(b_oh, s), starts)
        return sc.reshape(-1)[:L], wd.reshape(-1)[:L]

    return jax.vmap(per_seq)(oh_full)
