"""Library-sequence clustering and nested-insertion removal.

Replaces cd-hit-est (`get_nonRedundant_lib.py:33-49`, -c 0.8 -aS/-aL 0.95)
and `remove_nested_lib.py` for library FASTA sets: sequences are packed
into a spacer-separated "mini-genome" tensor, all-vs-all aligned with the
shared seed/chain kernels, and a greedy longest-first pass keeps one
representative per >=identity/coverage cluster; nested insertions
(a shorter entry embedded >=95% inside a longer one) are excised.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from hite_tpu.config import AlignConfig
from hite_tpu.genome import Genome
from hite_tpu.pipeline.copies import CopyFinder, GenomeIndex
from hite_tpu.utils.log import logger

SPACER = 100


def _pack(seqs: Sequence[np.ndarray]) -> Tuple[Genome, np.ndarray]:
    """Pack sequences into a mini-genome; returns (genome, starts [N])."""
    g = Genome.from_dict({f"s{i}": s for i, s in enumerate(seqs)})
    return g, g.starts.copy()


def _all_pairs_hits(
    seqs: Sequence[np.ndarray],
    cfg: AlignConfig,
    min_chain: int = 50,
) -> List[List[Tuple[int, int, int, int, int, int]]]:
    """For each seq: list of (other, qs, qe, os, oe, nseeds) chain hits."""
    mini, starts = _pack(seqs)
    seg_len = 1 << max(14, (len(mini.flat) - 1).bit_length() - 2)
    seg_len = min(seg_len, 1 << 18)
    gindex = GenomeIndex(mini, cfg, seg_len=seg_len)
    finder = CopyFinder(gindex, max_chains=256)

    # map every sequence against the mini-genome; hits on other sequences
    # give pairwise coverage
    hits: List[List[Tuple[int, int, int, int, int, int]]] = [[] for _ in seqs]
    copy_sets = finder.find_copies(list(seqs), min_coverage=0.0,
                                  max_copies=256, max_len_ratio=10.0)
    ends = starts + np.array([len(s) for s in seqs])
    for i, chs in enumerate(copy_sets):
        for h in chs:
            j_arr = np.searchsorted(starts, h.start, side="right") - 1
            j = int(np.clip(j_arr, 0, len(seqs) - 1))
            if j == i:
                continue
            if h.end > ends[j] + SPACER // 2:
                continue
            os_ = max(0, h.start - starts[j])
            oe = min(len(seqs[j]), h.end - starts[j])
            if oe - os_ >= min_chain:
                hits[i].append((j, 0, 0, int(os_), int(oe), h.nseeds))
    return hits


def cluster_seqs(
    seqs: Sequence[np.ndarray],
    cfg: AlignConfig,
    *,
    identity: float = 0.8,
    coverage: float = 0.95,
) -> Tuple[np.ndarray, List[int]]:
    """Greedy longest-first clustering.

    Returns (labels [N] — index of each sequence's representative,
    representative indices in priority order).
    """
    n = len(seqs)
    if n == 0:
        return np.zeros(0, np.int64), []
    lens = np.array([len(s) for s in seqs])
    # coverage[i][j]: fraction of seq i covered by alignments to seq j
    cov = np.zeros((n, n))
    hits = _all_pairs_hits(seqs, cfg)
    for i, hs in enumerate(hits):
        by_j: Dict[int, List[Tuple[int, int]]] = {}
        for (j, _qs, _qe, os_, oe, _ns) in hs:
            by_j.setdefault(j, []).append((os_, oe))
        for j, spans in by_j.items():
            merged: List[Tuple[int, int]] = []
            for s0, e0 in sorted(spans):
                if merged and s0 <= merged[-1][1]:
                    merged[-1] = (merged[-1][0], max(merged[-1][1], e0))
                else:
                    merged.append((s0, e0))
            covered = sum(e0 - s0 for s0, e0 in merged)
            cov[j, i] = covered / max(lens[j], 1)  # fraction of j covered by i's mapping
    order = np.argsort(-lens, kind="stable")
    labels = np.full(n, -1, np.int64)
    reps: List[int] = []
    for i in order:
        if labels[i] >= 0:
            continue
        labels[i] = i
        reps.append(int(i))
        for j in order:
            if labels[j] >= 0 or j == i:
                continue
            if cov[j, i] >= coverage or cov[i, j] >= coverage * lens[j] / max(lens[i], 1):
                labels[j] = i
    return labels, reps


def subcluster_members(
    member_seqs: Sequence[np.ndarray],
    *,
    k: int = 4,
    dist_threshold: float = 0.25,
) -> List[List[int]]:
    """Split one coverage-cluster into k-mer-distance sub-clusters.

    TPU-native stand-in for the per-cluster Ninja tree clustering of
    `deredundant_for_LTR_v5` (`generate_cons_v1`/`read_Ninja_clusters`,
    `Util.py:12457-12515`): members get batched 4-mer frequency vectors
    (one device op) and are grouped by single-linkage connected components
    at a cosine-distance threshold — coverage clustering lumps entries
    that align end-to-end regardless of identity; this recovers the
    identity sub-structure so each sub-family gets its own consensus.

    Returns lists of indices into `member_seqs`, largest first.
    """
    import jax.numpy as jnp

    from hite_tpu.models.features import kmer_frequencies
    from hite_tpu.pipeline.candidates import pad_rows, pad_seqs

    n = len(member_seqs)
    if n <= 1:
        return [list(range(n))]
    mat, lens = pad_seqs(member_seqs, n_rows=pad_rows(n))
    freqs = np.asarray(kmer_frequencies(jnp.asarray(mat), jnp.asarray(lens),
                                        k))[:n]
    norm = np.linalg.norm(freqs, axis=1, keepdims=True)
    unit = freqs / np.maximum(norm, 1e-9)
    dist = 1.0 - unit @ unit.T                      # cosine distance [n, n]
    adj = dist <= dist_threshold
    # single-linkage components via union-find
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in range(i + 1, n):
            if adj[i, j]:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[ri] = rj
    groups: Dict[int, List[int]] = {}
    for i in range(n):
        groups.setdefault(find(i), []).append(i)
    return sorted(groups.values(), key=len, reverse=True)


def _star_consensus(center: np.ndarray, member_seqs: List[np.ndarray]
                    ) -> np.ndarray:
    """Majority consensus of members projected onto `center`."""
    import jax.numpy as jnp

    from hite_tpu.ops.boundary import consensus as col_consensus
    from hite_tpu.ops.msa import project_to_center
    from hite_tpu.pipeline.candidates import bucket_for, pad_rows, pad_seqs

    width = bucket_for(len(center))
    mat, lens = pad_seqs(member_seqs, width, n_rows=pad_rows(len(member_seqs)))
    c_pad = np.full(width, 4, np.uint8)
    c_pad[: len(center)] = center
    M = project_to_center(jnp.asarray(c_pad), jnp.asarray(mat),
                          jnp.asarray(lens))
    # mask pow2-padding rows so they don't count as gap-majority votes
    cons, _sup = col_consensus(M, row_ok=jnp.asarray(lens) > 0)
    cons = np.asarray(cons)[: len(center)]
    cons = cons[cons < 4]
    return cons.astype(np.uint8) if len(cons) >= 0.5 * len(center) else center


def cluster_consensi(
    seqs: Sequence[np.ndarray],
    labels: np.ndarray,
    reps: Sequence[int],
    min_members: int = 3,
    max_members: int = 50,
    subcluster: bool = True,
) -> Dict[int, List[np.ndarray]]:
    """Per-cluster consensus list via sub-clustering + anchor-projection MSA.

    The full `deredundant_for_LTR_v5` consensus stage (`generate_cons_v1`
    `Util.py:12457-12498`): each coverage-cluster is split into k-mer
    sub-clusters (Ninja-tree equivalent, `subcluster_members`); every
    sub-cluster with >= min_members yields a column-majority consensus,
    singleton/small sub-clusters yield their longest raw member.  Returns
    {rep_index: [consensus codes, ...]} — first entry is the sub-cluster
    containing the representative.
    """
    out: Dict[int, List[np.ndarray]] = {}
    for rep in reps:
        members = [i for i in range(len(seqs)) if labels[i] == rep]
        if len(members) < min_members:
            out[rep] = [seqs[rep]]
            continue
        members = members[:max_members]
        groups = (subcluster_members([seqs[i] for i in members])
                  if subcluster else [list(range(len(members)))])
        rep_local = members.index(rep) if rep in members else 0
        # sub-cluster containing the representative goes first
        groups.sort(key=lambda g: rep_local not in g)
        consensi: List[np.ndarray] = []
        for g in groups:
            g_idx = [members[i] for i in g]
            if len(g_idx) < min_members:
                longest = max(g_idx, key=lambda i: len(seqs[i]))
                consensi.append(seqs[longest])
                continue
            center_i = max(g_idx, key=lambda i: len(seqs[i]))
            consensi.append(_star_consensus(
                seqs[center_i], [seqs[i] for i in g_idx]))
        out[rep] = consensi
    return out


def cluster_consensus(
    seqs: Sequence[np.ndarray],
    labels: np.ndarray,
    reps: Sequence[int],
    min_members: int = 3,
    max_members: int = 50,
) -> Dict[int, np.ndarray]:
    """One consensus per cluster (the representative's sub-cluster)."""
    multi = cluster_consensi(seqs, labels, reps, min_members=min_members,
                             max_members=max_members)
    return {rep: cons[0] for rep, cons in multi.items()}


def remove_nested(
    seqs: Sequence[np.ndarray],
    cfg: AlignConfig,
    *,
    coverage: float = 0.95,
    min_interior_margin: int = 50,
) -> List[np.ndarray]:
    """Excise nested insertions of shorter entries inside longer ones.

    Decision-level `remove_nested_lib.py:29-117`: when >=coverage of a
    shorter entry aligns strictly inside a longer entry (away from its
    ends), the inserted span is cut out of the longer entry.
    """
    n = len(seqs)
    out = [s.copy() for s in seqs]
    hits = _all_pairs_hits(seqs, cfg)
    lens = np.array([len(s) for s in seqs])
    cut_spans: List[List[Tuple[int, int]]] = [[] for _ in range(n)]
    for i, hs in enumerate(hits):
        # i maps into j: if i is shorter and lands interior to j, mark the cut
        for (j, _qs, _qe, os_, oe, _ns) in hs:
            if lens[i] >= lens[j]:
                continue
            if (oe - os_) < coverage * lens[i]:
                continue
            if os_ > min_interior_margin and oe < lens[j] - min_interior_margin:
                cut_spans[j].append((os_, oe))
    for j, spans in enumerate(cut_spans):
        if not spans:
            continue
        keep = np.ones(lens[j], bool)
        for s0, e0 in spans:
            keep[s0:e0] = False
        out[j] = out[j][keep]
        logger.info("remove_nested: excised %d bp from entry %d",
                    int((~keep).sum()), j)
    return out
