"""Deep LTR filtering: both-ends frame matrices + CNN judgement.

Re-implements FiLTR's high-copy LTR judgement path (SURVEY.md §3.4,
`bin/FiLTR-main/src/LTR_filter.py:27-209`): for each intact-LTR candidate,
full-length copies are fetched and their +-100bp boundary frames rendered
as an MSA matrix; the rule judge demands that flank homology BREAK at the
element boundaries (`judge_ltr_from_both_ends_frame`, src/Util.py:10477);
the dual-branch CNN (`models.ltr_filter.LTRFilterCNN`) scores the frame
image + k-mer channels; and merge semantics follow the reference: a rule
verdict of False VETOES a CNN verdict of True
(`alter_deep_learning_results`, src/Util.py:10711-10757).

The CNN runs only when trained parameters are supplied (the reference
ships production_model.pth; here training data is generated from
rule-confident positives/negatives — `make_training_frames`).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from hite_tpu.config import PipelineConfig
from hite_tpu.genome import Genome
from hite_tpu.models.features import frame_image, kmer_frequencies
from hite_tpu.models.ltr_filter import LTRFilterCNN, kmer_channels
from hite_tpu.ops.boundary import adaptive_threshold, column_stats, search_boundary
from hite_tpu.ops.msa import project_to_center
from hite_tpu.pipeline.candidates import pad_rows, pad_seqs
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.pipeline.ltr import LTRRecord
from hite_tpu.utils.log import logger, stage_timer

FRAME_FLANK = 100   # FiLTR both-ends frame width (.matrix files)
FRAME_CORE = 100    # bp of element interior kept on each side


def _frame_inputs(
    genome: Genome,
    rec: LTRRecord,
    copies,
    max_rows: int = 100,
) -> Optional[Tuple[np.ndarray, list]]:
    """(center [2W], per-copy row list) for the both-ends frame, or None."""
    width = FRAME_FLANK + FRAME_CORE
    center_l = genome.extract(rec.start, rec.start + FRAME_CORE, FRAME_FLANK)
    center_r = genome.extract(rec.end - FRAME_CORE, rec.end, FRAME_FLANK)
    if len(center_l) < width or len(center_r) < width:
        return None
    center = np.concatenate([center_l[: width], center_r[-width:]])

    rows = []
    from hite_tpu.io.fasta import revcomp as np_revcomp
    for h in copies[:max_rows]:
        seq_l = genome.extract(h.start, h.start + FRAME_CORE, FRAME_FLANK)
        seq_r = genome.extract(h.end - FRAME_CORE, h.end, FRAME_FLANK)
        if h.strand == 1:
            seq_l, seq_r = np_revcomp(seq_r), np_revcomp(seq_l)
        if len(seq_l) < width or len(seq_r) < width:
            continue
        rows.append(np.concatenate([seq_l[: width], seq_r[-width:]]))
    if len(rows) < 1:
        return None
    return center.astype(np.uint8), rows


def both_ends_frame(
    genome: Genome,
    rec: LTRRecord,
    copies,
    max_rows: int = 100,
) -> Optional[np.ndarray]:
    """[R, 2*(FLANK+CORE)] matrix of left|right boundary frames per copy.

    Equivalent of the reference's `.matrix` files
    (`get_both_ends_frame`, FiLTR src/Util.py:1401-1497): for every
    full-length copy, 100bp of outside flank + 100bp of element on each
    boundary, aligned via projection onto the candidate's own frame.
    """
    inputs = _frame_inputs(genome, rec, copies, max_rows)
    if inputs is None:
        return None
    center, rows = inputs
    width = FRAME_FLANK + FRAME_CORE
    mat, lens = pad_seqs(rows, 2 * width, n_rows=pad_rows(len(rows)))
    M = project_to_center(jnp.asarray(center),
                          jnp.asarray(mat), jnp.asarray(lens))
    return np.asarray(M)


def _rule_core(M: jnp.ndarray) -> jnp.ndarray:
    row_ok = (M < 4).any(1)      # mask pow2-padding all-N rows
    present = jnp.sum(row_ok)
    thr = adaptive_threshold(present)
    stats = column_stats(M, thr, row_ok=row_ok)
    width = FRAME_FLANK + FRAME_CORE
    left = search_boundary(stats.homo, jnp.int32(FRAME_FLANK), side="left",
                           radius=30)
    right = search_boundary(stats.homo, jnp.int32(2 * width - FRAME_FLANK),
                            side="right", radius=30)
    return left.found & right.found


_rule_judge_dev = jax.jit(_rule_core)


def rule_judge_frame(M: np.ndarray) -> bool:
    """True when flank homology breaks at both boundaries.

    `judge_ltr_from_both_ends_frame` -> `judge_both_ends_frame`
    (src/Util.py:10477/10696): a real LTR element's copies come from
    different loci, so columns OUTSIDE the element must not be homologous,
    while columns inside are.
    """
    return bool(_rule_judge_dev(jnp.asarray(M)))


def _flank_homo_core(M: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Per-candidate flank-homogeneity statistics from a frame matrix.

    Returns (n_rows, left_homo, right_homo, joined_homo, joined_random):
    a row is "homo" when it has at least one homologous partner row —
    exactly membership in a >1-size cluster under the reference's cd-hit
    single-linkage clustering (sort_frame, FiLTR utils/data_util.py:2792+).
    Pairwise homology is aligned-column identity on the MXU (the frame rows
    are already projected into center coordinates):
      per-side  — overlap >= 20 cols at >= 0.8 identity  (cd-hit -c .8 -A 20)
      joined    — >= 0.95 mutual coverage at >= 0.95     (-c .95 -aS/aL .95)
    """
    width = FRAME_FLANK
    row_ok = (M < 4).sum(axis=1) > 0

    def side(S, min_ov_abs, min_id, mutual):
        oh = jax.nn.one_hot(S, 4, dtype=jnp.float32)        # N/gap -> zeros
        valid = (S < 4).astype(jnp.float32)
        matches = jnp.einsum("ilc,jlc->ij", oh, oh)
        overlap = jnp.einsum("il,jl->ij", valid, valid)
        ident = matches / jnp.maximum(overlap, 1.0)
        nvalid = valid.sum(axis=1)
        min_ov = jnp.maximum(
            jnp.float32(min_ov_abs),
            mutual * jnp.minimum(nvalid[:, None], nvalid[None, :]))
        homo_pair = (overlap >= min_ov) & (ident >= min_id)
        homo_pair &= ~jnp.eye(S.shape[0], dtype=bool)
        homo_pair &= row_ok[:, None] & row_ok[None, :]
        return homo_pair.any(axis=1)

    left_h = side(M[:, :width], 20.0, 0.8, 0.0)
    right_h = side(M[:, -width:], 20.0, 0.8, 0.0)
    joined = jnp.concatenate([M[:, :width], M[:, -width:]], axis=1)
    joined_h = side(joined, 50.0, 0.95, 0.95)
    n = row_ok.sum()
    return (n, (left_h & row_ok).sum(), (right_h & row_ok).sum(),
            (joined_h & row_ok).sum(), (row_ok & ~joined_h).sum())


_flank_homo_stats = jax.jit(_flank_homo_core)


def _frame_judge_core(centers: jnp.ndarray, mats: jnp.ndarray,
                      lens: jnp.ndarray):
    """Fused per-bucket frame pipeline: project copies onto the center
    frame, flank-homogeneity stats and the boundary rule verdict — ONE
    device program instead of three per record (each per-record dispatch
    costs a tunnel round trip; round-3 hardware profile showed the
    per-record loop dominating the LTR deep-filter stage).

    centers [B, 2W] uint8, mats [B, R, 2W] uint8, lens [B, R] int32 ->
    (M [B, R, 2W], stats [B, 5] int32, rule [B] bool).
    """
    def one(center, mat, l):
        M = project_to_center(center, mat, l)
        n, lh, rh, jh, jr = _flank_homo_core(M)
        rule = _rule_core(M)
        return M, jnp.stack([n, lh, rh, jh, jr]).astype(jnp.int32), rule

    return jax.vmap(one)(centers, mats, lens)


_frame_judge_batch = jax.jit(_frame_judge_core)

# mesh-sharded frame-judge executables (record batch axis over the mesh;
# bit-identical to the single-device vmap)
_SHARDED_FRAME_CACHE: dict = {}


def _frame_judge_batch_sharded(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    fn = _SHARDED_FRAME_CACHE.get(id(mesh))
    if fn is None:
        shard_b = NamedSharding(mesh, P(tuple(mesh.axis_names)))
        fn = jax.jit(_frame_judge_core, in_shardings=(shard_b,) * 3)
        _SHARDED_FRAME_CACHE[id(mesh)] = fn
    return fn


def flank_homogeneity_ok(M: np.ndarray) -> bool:
    """FiLTR flank-homogeneity cluster filters (LTR_filter.py:72-103).

    (a) per-side (`sort_matrix_dir`): a real LTR's copies come from
    different loci, so each side's 100 bp flank rows must be mostly
    mutually NON-homologous; >= 0.8 (<20 rows) / 0.9 homologous fraction
    on either side is the truncated-terminal / repeat-region signature.
    (b) joined (`filter_ltr_by_flanking_cluster`): drop when rows whose
    concatenated left+right flanks are near-identical to another row's
    reach half the rows (LTR inside a mobile higher-order repeat).
    Candidates with <= 1 frame rows are dropped here like the reference
    (the single-copy gate downstream re-admits structured ones).
    """
    n, lh, rh, jh, jr = (int(x) for x in _flank_homo_stats(jnp.asarray(M)))
    if n <= 1:
        return False
    thr = 0.8 if n < 20 else 0.9
    if lh / n >= thr or rh / n >= thr:
        return False
    if jh >= jr:
        return False
    return True


def single_copy_gate(
    genome: Genome,
    records: Sequence[LTRRecord],
    copy_counts: Sequence[int],
    cfg: PipelineConfig,
) -> List[bool]:
    """FiLTR single-copy filter (`filter_single_copy_ltr`,
    src/Util.py:5955+, driven at LTR_filter.py:702-726): an element with
    <= 1 full-length copies survives only when it has TSD structure AND a
    >= 95%-intact LTR protein in its internal region; an intact OTHER-class
    TE protein (TIR/Helitron transposase) inside disqualifies it outright.

    LTRPeps.lib is a missing blob upstream (only blast index shards exist);
    a user copy activates via HITE_TPU_LIBRARY_DIR like LINEPeps.  Without
    it the protein half runs on the data-free RT MOTIF GRAMMAR
    (`domain.rt_motif_present`: [LIVM]PQG .. [YF]xDD in one reading frame
    — the conserved pol core every LTR retroelement carries), restoring
    the reference's TSD + intact-protein conjunction.
    """
    import os

    from hite_tpu.pipeline.domain import (
        DomainScanner, rescue_by_domain, rt_motif_present,
    )

    singles = [i for i, c in enumerate(copy_counts) if c <= 1]
    keep = [True] * len(records)
    if not singles:
        return keep

    data_dir = os.path.join(os.path.dirname(__file__), "..", "data",
                            "protein")
    lib_dir = os.environ.get("HITE_TPU_LIBRARY_DIR", data_dir)
    ltr_pep = os.path.join(lib_dir, "LTRPeps.lib")
    internals = [genome.extract(records[i].lltr_end, records[i].rltr_start)
                 for i in singles]

    if os.path.exists(ltr_pep):
        has_ltr_protein = rescue_by_domain(
            internals, DomainScanner.from_fasta(ltr_pep))
    else:
        has_ltr_protein = rt_motif_present(internals)
    has_other_protein = np.zeros(len(singles), bool)
    for other in ("TIRPeps.lib", "HelitronPeps.lib"):
        path = os.path.join(data_dir, other)
        if os.path.exists(path):
            has_other_protein |= rescue_by_domain(
                internals, DomainScanner.from_fasta(path))

    dropped = 0
    for si, i in enumerate(singles):
        r = records[i]
        if has_other_protein[si]:
            keep[i] = False
            dropped += 1
            continue
        # structure = a 4-6 bp TSD (reference search_ltr_structure scans
        # the 8+3 bp end windows for a shared 4-6-mer; refine_and_filter
        # already snapped rec.tsd_len from the same +-4 bp window search)
        structured = r.tsd_len > 0
        protein_ok = bool(has_ltr_protein[si])
        if not (structured and protein_ok):
            keep[i] = False
            dropped += 1
    if dropped:
        logger.info("ltr.single_copy: dropped %d/%d single-copy records",
                    dropped, len(singles))
    return keep


def cnn_inputs(M: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(image [100, L, 3], kmer channels [16, 16, 2]) from a frame matrix."""
    img = np.asarray(frame_image(jnp.asarray(M), n_rows=100))
    # k-mer channels from the consensus row content
    flat = M[M < 4]
    if len(flat) < 32:
        flat = np.zeros(64, np.uint8)
    # pad to a pow2 bucket: kmer_frequencies masks by `lens`, so the
    # result is unchanged, but an unbucketed width recompiled the kernel
    # for EVERY distinct content length (~1.7 s/frame of pure compiles
    # during CNN training input prep)
    n_true = flat.shape[0]
    P = 1 << (n_true - 1).bit_length()
    if P > n_true:
        flat = np.concatenate([flat, np.full(P - n_true, 4, np.uint8)])
    seq = jnp.asarray(flat[None, :])
    lens = jnp.asarray([n_true])
    f3 = kmer_frequencies(seq, lens, 3)
    f4 = kmer_frequencies(seq, lens, 4)
    km = np.asarray(kmer_channels(f3, f4))[0]
    return img, km


def deep_filter_records(
    genome: Genome,
    records: Sequence[LTRRecord],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
    cnn_params=None,
    low_copy_threshold: int = 5,
    mesh=None,
) -> List[LTRRecord]:
    """Filter intact-LTR records with the frame rule (+ CNN when trained).

    Merge semantics (alter_deep_learning_results): rule False vetoes;
    CNN only confirms among rule-True candidates; low-copy (<threshold)
    candidates are judged by the rule alone, like the reference.
    """
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)
    model = LTRFilterCNN() if cnn_params is not None else None

    kept: List[LTRRecord] = []
    kept_copies: List[int] = []
    width2 = 2 * (FRAME_FLANK + FRAME_CORE)
    with stage_timer("ltr.deep_filter"):
        copy_sets = finder.find_copies(
            [genome.extract(r.start, r.end) for r in records],
            min_coverage=0.8, max_copies=cfg.msa.max_copies)

        # bucket records by frame row count; each bucket runs the fused
        # project+homogeneity+rule program ONCE (per-record dispatches paid
        # a tunnel round trip each — the round-3 deep-filter hot spot)
        buckets: Dict[int, List[Tuple[int, np.ndarray, list]]] = {}
        for i, (rec, copies) in enumerate(zip(records, copy_sets)):
            inputs = (_frame_inputs(genome, rec, copies)
                      if len(copies) > 1 else None)
            if inputs is None:
                # too little copy context for the frame filters: multi-copy
                # records without frames pass (like the reference's
                # not-found-boundary fallback); single-copy ones defer to
                # the structure+protein gate below
                kept.append(records[i])
                kept_copies.append(len(copies))
                continue
            center, rows = inputs
            buckets.setdefault(pad_rows(len(rows)), []).append(
                (i, center, rows))

        cnn_batch: List[Tuple[int, np.ndarray]] = []  # (rec idx, M)
        passed_rule: Dict[int, bool] = {}
        for rb, items in sorted(buckets.items()):
            B = 16
            for b0 in range(0, len(items), B):
                sub = items[b0 : b0 + B]
                Bp = max(1, 1 << (len(sub) - 1).bit_length())
                if mesh is not None:
                    D = mesh.devices.size
                    Bp = -(-Bp // D) * D
                centers = np.full((Bp, width2), 4, np.uint8)
                mats = np.full((Bp, rb, width2), 4, np.uint8)
                lens = np.zeros((Bp, rb), np.int32)
                for bi, (_i, center, rows) in enumerate(sub):
                    centers[bi] = center
                    m, l = pad_seqs(rows, width2, n_rows=rb)
                    mats[bi] = m
                    lens[bi] = l
                judge_fn = (_frame_judge_batch_sharded(mesh)
                            if mesh is not None else _frame_judge_batch)
                Ms, stats, rules = judge_fn(
                    jnp.asarray(centers), jnp.asarray(mats),
                    jnp.asarray(lens))
                Ms = np.asarray(Ms)
                stats = np.asarray(stats)
                rules = np.asarray(rules)
                for bi, (i, _c, _r) in enumerate(sub):
                    n, lh, rh, jh, jr = (int(x) for x in stats[bi])
                    thr = 0.8 if n < 20 else 0.9
                    homo_ok = (n > 1 and lh / n < thr and rh / n < thr
                               and jh < jr)
                    if not homo_ok or not rules[bi]:
                        continue
                    passed_rule[i] = True
                    if model is not None and \
                            len(copy_sets[i]) > low_copy_threshold:
                        cnn_batch.append((i, Ms[bi]))
                    else:
                        rec = records[i]
                        rec.copy_count = max(rec.copy_count,
                                             len(copy_sets[i]))
                        kept.append(rec)
                        kept_copies.append(len(copy_sets[i]))

        if cnn_batch:   # one CNN apply for every high-copy rule-True record
            from hite_tpu.models.trainer import jit_apply

            imgs, kms = zip(*[cnn_inputs(M) for _i, M in cnn_batch])
            n_cnn = len(imgs)
            Bp = pad_rows(n_cnn, min_rows=8)
            imat = np.zeros((Bp,) + imgs[0].shape, np.float32)
            kmat = np.zeros((Bp,) + kms[0].shape, np.float32)
            imat[:n_cnn] = np.stack(imgs)
            kmat[:n_cnn] = np.stack(kms)
            logits = np.asarray(jit_apply(
                model, cnn_params, jnp.asarray(imat),
                jnp.asarray(kmat)))[:n_cnn]
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            probs = (e / e.sum(axis=1, keepdims=True))[:, 1]
            for (i, _M), p in zip(cnn_batch, probs):
                if p >= cfg.ltr.deep_threshold:
                    rec = records[i]
                    rec.copy_count = max(rec.copy_count, len(copy_sets[i]))
                    kept.append(rec)
                    kept_copies.append(len(copy_sets[i]))

        # restore input order (buckets interleave records)
        order = {id(r): i for i, r in enumerate(records)}
        pairs = sorted(zip(kept, kept_copies), key=lambda p: order[id(p[0])])
        kept = [p[0] for p in pairs]
        kept_copies = [p[1] for p in pairs]

        # FiLTR single-copy gate: <=1 full-length copies need TSD structure
        # + intact LTR protein (and no other-class TE protein inside)
        mask = single_copy_gate(genome, kept, kept_copies, cfg)
        kept = [r for r, m in zip(kept, mask) if m]
    logger.info("ltr.deep_filter: %d/%d records kept", len(kept), len(records))
    return kept


def cross_class_filter(
    genome: Genome,
    records: Sequence[LTRRecord],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
    mesh=None,
) -> Tuple[List[LTRRecord], Dict[str, List[np.ndarray]]]:
    """FiLTR's TIR/Helitron/SINE cross-class filters.

    Re-implements `LTR_filter.py:175-200` (SURVEY.md §3.4): an intact-LTR
    record whose LEFT TERMINAL is itself a structurally confirmed TIR /
    Helitron / SINE element is a repeat pair masquerading as an LTR —
    two genomic copies of a non-LTR element produce exactly this signature
    (identical "terminals" far apart, random "internal").  Such records
    leave the LTR set and their terminal sequences are re-routed to the
    matching module library (the reference's `confident_*_from_ltr.fa`).

    Returns (kept records, {"tir"|"helitron"|"non_ltr": [terminal codes]}).
    """
    from hite_tpu.ops.terminal import find_terminal_repeat
    from hite_tpu.pipeline.boundary_adjust import adjust_candidate
    from hite_tpu.pipeline.helitron import make_helitron_judge
    from hite_tpu.pipeline.non_ltr import make_nonltr_judge
    from hite_tpu.pipeline.tir import make_tir_judge

    pools: Dict[str, List[np.ndarray]] = {}
    if not records:
        return [], pools
    term_iv = np.array([[r.lltr_start, r.lltr_end] for r in records],
                       np.int64)
    routed: Dict[int, str] = {}

    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)

    # Copy frames and family analyses are JUDGE-INDEPENDENT: fetch every
    # terminal's copies in ONE whole-genome join and analyze them in ONE
    # batched device call, then each class judge re-reads the same
    # precomputed analyses host-side (previously each of the three
    # classes re-paid its own join + batched analyze over the same
    # terminals — 3x the device work for identical inputs).
    from hite_tpu.pipeline.boundary_adjust import analyze_families_batched

    with stage_timer("ltr.cross_class"):
        all_copy_sets = finder.find_copies(
            [genome.extract(int(s), int(e)) for s, e in term_iv],
            min_coverage=0.9, max_copies=cfg.msa.max_copies)
        all_batch = [((int(term_iv[i, 0]), int(term_iv[i, 1])), copies)
                     for i, copies in enumerate(all_copy_sets)]
        all_analyses = analyze_families_batched(genome, all_batch, cfg.msa,
                                                mesh=mesh)

    def rejudge(idxs: List[int], judge, min_copies: int) -> List[int]:
        """Terminals whose full-length copy frames pass the given class
        judge (one round of the MSA boundary engine — the reference runs
        judge_boundary_v5 once on each terminal's frames,
        filter_tir/filter_helitron/filter_sine src/Util.py:9980-10250;
        the judge itself adapts to row count, so 2 rows suffice)."""
        hits = []
        for i in idxs:
            interval, copies = all_batch[i]
            res = adjust_candidate(genome, interval, copies, cfg.msa,
                                   judge, min_copies,
                                   precomputed=all_analyses[i])
            if res.accepted:
                hits.append((i, res.consensus))
        return hits

    with stage_timer("ltr.cross_class"):
        # TIR: copy frames pass the full TSD-vote judge AND the adjusted
        # consensus carries a terminal inverted repeat (the reference's
        # get_confident_TIR itrsearch step)
        tir_hits = rejudge(list(range(len(records))),
                           make_tir_judge(cfg.plant), 2)
        if tir_hits:
            mats, lens = pad_seqs([c for _, c in tir_hits],
                                  n_rows=pad_rows(len(tir_hits)))
            tr = find_terminal_repeat(
                jnp.asarray(mats), jnp.asarray(lens), inverted=True,
                window=cfg.terminal.end_window,
                min_identity=cfg.terminal.itr_identity,
                min_len=cfg.terminal.itr_min_len)
            ok = np.asarray(tr.found)
            for bi, (i, _c) in enumerate(tir_hits):
                if ok[bi]:
                    routed.setdefault(int(i), "tir")

        todo = [i for i in range(len(records)) if i not in routed]
        # Helitron: copy frames pass the ATC-head/CTRRT-tail judge
        for i, _c in rejudge(todo, make_helitron_judge(), 2):
            routed.setdefault(int(i), "helitron")

        todo = [i for i in range(len(records)) if i not in routed]
        # SINE: length window + the non-LTR tail/TSD judge on copy frames
        sine_todo = [i for i in todo
                     if cfg.non_ltr.sine_min
                     <= term_iv[i, 1] - term_iv[i, 0] <= cfg.non_ltr.sine_max]
        for i, _c in rejudge(sine_todo, make_nonltr_judge(cfg), 2):
            routed.setdefault(int(i), "non_ltr")

    kept = [r for i, r in enumerate(records) if i not in routed]
    for i, cls in sorted(routed.items()):
        pools.setdefault(cls, []).append(
            genome.extract(int(term_iv[i, 0]), int(term_iv[i, 1])))
    if routed:
        logger.info("ltr.cross_class: re-routed %d/%d records (%s)",
                    len(routed), len(records),
                    {c: len(v) for c, v in pools.items()})
    return kept, pools


def make_training_frames(
    genome: Genome,
    positives: Sequence[LTRRecord],
    negatives: Sequence[Tuple[int, int]],
    cfg: PipelineConfig,
    gindex: Optional[GenomeIndex] = None,
):
    """Training data for the CNN: frame inputs + labels (1 = real LTR).

    The reference's Reproduction/ scripts regenerate positive/negative
    samples from curated vs rejected candidates the same way.
    """
    gindex = gindex or GenomeIndex(genome, cfg.align)
    finder = CopyFinder(gindex)
    imgs, kms, labels = [], [], []
    for label, items in ((1, [(r.start, r.end) for r in positives]),
                         (0, list(negatives))):
        if not items:
            continue
        copy_sets = finder.find_copies(
            [genome.extract(int(s), int(e)) for s, e in items],
            min_coverage=0.8, max_copies=cfg.msa.max_copies)
        for (s, e), copies in zip(items, copy_sets):
            rec = LTRRecord(start=int(s), end=int(e), lltr_start=int(s),
                            lltr_end=int(s), rltr_start=int(e),
                            rltr_end=int(e), identity=1.0, insert_time=0.0)
            M = both_ends_frame(genome, rec, copies)
            if M is None:
                continue
            img, km = cnn_inputs(M)
            imgs.append(img)
            kms.append(km)
            labels.append(label)
    if not imgs:
        return (np.zeros((0, 100, 2 * (FRAME_FLANK + FRAME_CORE), 3)),
                np.zeros((0, 16, 16, 2)), np.zeros(0, np.int32))
    return np.stack(imgs), np.stack(kms), np.array(labels, np.int32)
