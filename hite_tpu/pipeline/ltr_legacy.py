"""Legacy LTR path: LTR_harvest/LTR_FINDER + LTR_retriever equivalents.

The reference's `--use_FiLTR 0` path is a DIFFERENT algorithm family from
FiLTR (`/root/reference/main.py:186-242`, `module/Util.py:569-704`):
GenomeTools LTRharvest finds maximal EXACT repeats via a suffix array
(seed length >= 30 bp, pair distance 1-15 kb), X-drop-extends each seed
to a similarity >= 85% LTR pair, and LTR_retriever then demands direct
structural evidence — a 4-6 bp TSD and/or the TG...CA dinucleotide
motif — for EVERY retained element (no ML filters, no frame judge).

TPU-native re-design (not a port of the suffix array):

1. Exact-repeat seeding — the suffix-array maximal-repeat scan is, on a
   TPU, the shared selfjoin (two device sorts) run with `run_gap` ~ 0:
   diagonal runs of exact k-mer matches merge ONLY while contiguous, so
   every surviving HSP is an exact repeat of length >= `seed_len`.
   (The FiLTR path instead chains HSPs ACROSS mismatches — that is the
   algorithmic difference between the two generators.)
2. X-drop extension — each seed opens a +-`ext` window on both sides;
   one batched Smith-Waterman per shape bucket aligns the windows and
   pins the maximal-scoring LTR pair (the X-drop role), reusing
   `refine_and_filter`'s device program.
3. LTR_retriever filter stack — identity >= 0.85, tandem-content gate,
   TSD snap, then the strict motif/TSD requirement
   (`LTR_retriever`'s defaults; reference drives it at main.py:219-242).

Both generators produce `LTRRecord`s, so the library/annotation stages
downstream are shared.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.ltr import (
    LTRRecord, LTRResult, refine_and_filter)
from hite_tpu.utils.log import logger, stage_timer


def harvest_exact_seeds(
    genome: Genome,
    cfg: PipelineConfig,
    seed_len: int = 20,
    use_masked: bool = True,
) -> List[Tuple[int, int, int, int]]:
    """Maximal exact-repeat seeds (qs, qe, ss, se) in the element window.

    LTRharvest suffix-array semantics: exact repeats >= `seed_len` whose
    start-to-start distance lies in [min_interior, max_interior +
    max_ltr_len].  `run_gap=2` merges diagonal k-mer runs only while
    contiguous (step-1 overlapping k-mers), so HSP length == exact-match
    run length; chaining across mismatched gaps (the FiLTR generator) is
    deliberately NOT applied.
    """
    import jax
    import jax.numpy as jnp

    from hite_tpu.ops.selfjoin import selfjoin_scan_packed, selfjoin_sorted

    lcfg = cfg.ltr
    acfg = cfg.align
    flat_d, L = genome.device_flat_padded(use_masked)
    Lp = int(flat_d.shape[0])
    max_off = lcfg.max_interior + lcfg.max_ltr_len
    seeds: List[Tuple[int, int, int, int]] = []
    best: dict = {}

    def one_chunk(chunk_d, off: int, Cl: int) -> None:
        s_dbin, s_qpos, s_spos, n_pairs_d = selfjoin_sorted(
            chunk_d, k=acfg.kmer_size, window=4, diag_band=32)
        n_pairs = int(n_pairs_d)
        budget = 1 << 20
        need = -(-max(n_pairs, 1) // budget)
        slices = 1 if need <= 1 else 1 << (need - 1).bit_length()
        packed = np.asarray(selfjoin_scan_packed(
            s_dbin, s_qpos, s_spos, n_pairs_d, k=acfg.kmer_size,
            run_gap=2, min_seeds=2, min_hsp_len=seed_len,
            max_hsps=32_768, max_seed_pairs=budget,
            budget_slices=min(slices, 64)))
        qs, qe, ss, se = (packed[i].astype(np.int64) for i in range(4))
        valid = packed[4].astype(bool)
        m = valid & (ss < Cl) & (ss > qs)          # forward strand, s right of q
        offd = ss - qs
        m &= (offd >= lcfg.min_interior) & (offd <= max_off)
        for a, b_, c, d in zip(qs[m], qe[m], ss[m], se[m]):
            # one seed per (locus, offset) cell; keep the longest repeat
            # (the suffix array's MAXIMAL-repeat property)
            key = ((off + int(a)) // 100, int(c - a) // 100)
            ln = int(b_ - a)
            cur = best.get(key)
            if cur is None or ln > cur[0]:
                best[key] = (ln, off + int(a), off + int(b_),
                             off + int(c), off + int(d))

    cap = 1 << 26
    if Lp <= cap:
        one_chunk(flat_d, 0, Lp)
    else:
        from hite_tpu.pipeline.coarse import _chunk_grid

        from hite_tpu.pipeline.copies import _chunk_slicer

        # argument-passed slice: a closed-over device array becomes a
        # jaxpr constant shipped with the remote compile request
        # (HTTP 413 at the 400 Mbp tier)
        _sl = _chunk_slicer(cap)

        def _slice(c0):
            return _sl(flat_d, c0)

        for c0 in _chunk_grid(L, cap, max_off):
            one_chunk(_slice(jnp.int32(c0)), c0, cap)
    seeds = [(a, b_, c, d) for (_ln, a, b_, c, d) in best.values()]
    seeds.sort()
    return seeds


def _seed_windows(
    seeds: List[Tuple[int, int, int, int]],
    cfg: PipelineConfig,
    ext: int = 0,
) -> List[Tuple[int, int, int, int]]:
    """X-drop extension windows: each exact seed +- `ext` bp on both
    sides, clipped so the two windows never overlap (a pair closer than
    that is a tandem, which the downstream tandem gate owns).

    ``ext=0`` derives min(2000, cfg.ltr.max_ltr_len).  DELIBERATE
    DEVIATION from the reference's ltrharvest `-maxlenltr 7000`
    (`Util.py:666-668`): the window SW is O(width^2) per pair, so a
    7 kb extension would make each window a >16k-wide DP; at 2 kb a
    recoverable LTR needs a >=seed_len exact run within ~2 kb of its
    termini — which recent (high-identity, the ones LTR_retriever keeps)
    elements essentially always have."""
    if ext <= 0:
        ext = min(2000, cfg.ltr.max_ltr_len)
    wins = []
    for (qa, qb, sa, sb) in seeds:
        mid = (qb + sa) // 2
        la = max(0, qa - ext)
        lb = min(qb + ext, mid)
        ra = max(sa - ext, mid)
        rb = sb + ext
        if lb - la >= 2 and rb - ra >= 2:
            wins.append((la, lb, ra, rb))
    return wins


def retriever_filter(
    genome: Genome,
    records: List[LTRRecord],
    boundary_tol: int = 10,
    min_old_identity: float = 0.91,
) -> List[LTRRecord]:
    """LTR_retriever's structural filter stack (reference drives it with
    defaults at `main.py:219-242` / `Util.py:697-704`):

    1. TSD and/or TG...CA motif — candidates with neither are false
       positives regardless of pair identity (FiLTR relaxes this for
       high-identity pairs; the legacy path does not).
    2. BOUNDARY-ALIGNMENT AGREEMENT: the 5' and 3' LTR sequences must
       align essentially end-to-end — the SW alignment of lLTR vs rLTR
       has to reach within `boundary_tol` bp of all four termini
       (LTR_retriever's boundary check, ltrharvest `-vic 10`).  A
       high-identity pair whose reported boundaries are shifted into
       flank/interior aligns at an internal offset and is rejected.
    3. DIVERGENCE + joint evidence: pairs below `min_old_identity`
       (LTR_retriever's default intact-element identity tier) must carry
       BOTH a TSD and the terminal motif — diverged elements need the
       full structural combination, not either half.
    """
    import jax.numpy as jnp

    from hite_tpu.ops.terminal import batched_local_align_auto
    from hite_tpu.pipeline.candidates import pad_rows, pad_seqs

    if not records:
        return []

    # batched lLTR-vs-rLTR end-to-end alignment (boundary agreement)
    lseqs = [genome.extract(r.lltr_start, r.lltr_end) for r in records]
    rseqs = [genome.extract(r.rltr_start, r.rltr_end) for r in records]
    width = max(max((len(s) for s in lseqs), default=64),
                max((len(s) for s in rseqs), default=64), 64)
    width = 1 << (width - 1).bit_length()
    rows = pad_rows(len(records))
    lmat, _ = pad_seqs(lseqs, width, n_rows=rows)
    rmat, _ = pad_seqs(rseqs, width, n_rows=rows)
    al = batched_local_align_auto(jnp.asarray(lmat), jnp.asarray(rmat))
    qs, qe = np.asarray(al.qs), np.asarray(al.qe)
    ss, se = np.asarray(al.ss), np.asarray(al.se)

    kept = []
    n_struct = n_bound = n_div = 0
    for i, r in enumerate(records):
        l2 = genome.extract(r.start, r.start + 2)
        r2 = genome.extract(r.end - 2, r.end)
        # TG...CA with <=1 mismatch across the 4 motif bases
        # (ltrharvest -motif TGCA -motifmis 1)
        mm = 4
        if len(l2) == 2 and len(r2) == 2:
            mm = int(l2[0] != 3) + int(l2[1] != 2) + \
                 int(r2[0] != 1) + int(r2[1] != 0)
        has_motif = mm <= 1
        has_tsd = r.tsd_len > 0
        if not (has_motif or has_tsd):
            n_struct += 1
            continue
        agree = (qs[i] <= boundary_tol and ss[i] <= boundary_tol
                 and qe[i] >= len(lseqs[i]) - boundary_tol
                 and se[i] >= len(rseqs[i]) - boundary_tol)
        if not agree:
            n_bound += 1
            continue
        if r.identity < min_old_identity and not (has_motif and has_tsd):
            n_div += 1
            continue
        kept.append(r)
    if len(kept) < len(records):
        logger.info(
            "ltr.legacy: retriever filter dropped %d/%d "
            "(%d no TSD/motif, %d boundary disagreement, "
            "%d diverged without joint TSD+motif)",
            len(records) - len(kept), len(records), n_struct, n_bound,
            n_div)
    return kept


def run_legacy_ltr_detection(
    genome: Genome,
    cfg: PipelineConfig,
    gindex=None,
) -> LTRResult:
    """Legacy LTR module: harvest seeds -> window SW -> retriever filters.

    Reference pipeline shape: LTRharvest + LTR_FINDER candidate union ->
    LTR_retriever validation -> intact list (`main.py:186-242`).  No
    FiLTR frame judge, CNN, recombination or cross-class filters run on
    this path — structural evidence only, like the tools it replaces.
    """
    with stage_timer("ltr.legacy_seeds"):
        seeds = harvest_exact_seeds(genome, cfg)
    logger.info("ltr.legacy: %d exact-repeat seeds", len(seeds))
    pairs = _seed_windows(seeds, cfg)
    with stage_timer("ltr.legacy_refine"):
        records = refine_and_filter(genome, pairs, cfg)
    records = retriever_filter(genome, records)
    logger.info("ltr.legacy: %d intact LTR records", len(records))

    if records and gindex is not None:
        from hite_tpu.pipeline.copies import CopyFinder

        finder = CopyFinder(gindex)
        copies = finder.find_copies(
            [genome.extract(r.start, r.end) for r in records],
            min_coverage=0.8, max_copies=cfg.msa.max_copies)
        for r, c in zip(records, copies):
            r.copy_count = max(1, len(c))
    return LTRResult(records=records)
