"""Keyframe database: dense BoW rows + batched candidate retrieval.

TPU-native rebuild of the reference's KeyFrameDatabase (reference:
src/KeyFrameDatabase.cc): the word->keyframe inverted file becomes a dense
[K_max, n_words] tf-idf matrix; loop/relocalization candidate retrieval is
one batched L1 score against every keyframe at once, followed by the
reference's gating: exclude covisible keyframes, require score >= minScore,
accumulate scores over each candidate's top-10 covisibility group and keep
those above 0.75 x best accumulated score
(reference: DetectLoopCandidates :76-197, DetectRelocalizationCandidates
:199-309 — word-sharing prefilters were inverted-file bookkeeping; dense
scoring subsumes them).

All device work is jit-compiled once per vocabulary: BoW transform +
database update is ONE device call per keyframe, candidate scoring ONE
call per query (the covisibility matrix arrives batched from
mapstate.covisibility_matrix).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..mapstate.map import MapState, covisibility_matrix
from . import vocabulary as V


class KeyFrameDatabase:
    """Host-managed dense BoW database aligned with MapState keyframe slots."""

    def __init__(self, voc: V.Vocabulary, k_max: int):
        self.voc = voc
        self.bow = jnp.zeros((k_max, voc.n_words), jnp.float32)
        # jit once per vocabulary: the tree arrays are closure constants
        self._frame_vec = jax.jit(
            lambda desc, valid: V.bow_vectors(
                voc, V.transform(voc, desc, valid), valid))
        self._add = jax.jit(
            lambda bow, kf, desc, valid: bow.at[kf].set(
                V.bow_vectors(voc, V.transform(voc, desc, valid), valid)),
            donate_argnums=0)
        self._scores = jax.jit(
            lambda bow, vec, kf_valid: jnp.where(
                kf_valid, V.score_l1(vec, bow), -1.0))

    def add(self, kf: int, desc: jax.Array, valid: jax.Array):
        self.bow = self._add(self.bow, kf, desc, valid)

    def permute(self, live_slots: np.ndarray, n_live: int):
        """Mirror a keyframe compaction (mapstate.compact_keyframes): live
        rows move to the front in order, evicted rows are zeroed (the
        reference erases culled keyframes from the inverted file,
        KeyFrameDatabase::erase)."""
        k_max = self.bow.shape[0]
        order = np.zeros(k_max, np.int32)
        order[:n_live] = live_slots[:n_live]
        bow = self.bow[jnp.asarray(order)]
        mask = jnp.arange(k_max) < n_live
        self.bow = jnp.where(mask[:, None], bow, 0.0)

    def grow(self, k_max: int):
        """Re-pad the row dimension after map capacity growth."""
        k0 = self.bow.shape[0]
        if k_max > k0:
            self.bow = jnp.pad(self.bow, ((0, k_max - k0), (0, 0)))

    def frame_vector(self, desc: jax.Array, valid: jax.Array) -> jax.Array:
        return self._frame_vec(desc, valid)

    def scores(self, vec: jax.Array, kf_valid: jax.Array) -> jax.Array:
        return self._scores(self.bow, vec, kf_valid)

    def detect_loop_candidates(self, m: MapState, kf: int, min_score: float,
                               max_candidates: int = 5,
                               covis: np.ndarray | None = None,
                               scores: np.ndarray | None = None) -> list[int]:
        """Reference gating (KeyFrameDatabase.cc:76-197) over dense scores.

        covis/scores: optional precomputed covisibility matrix / score
        vector (numpy) to avoid extra device round trips."""
        if covis is None:
            covis = np.asarray(covisibility_matrix(m))
        s = (np.array(scores) if scores is not None
             else np.array(self.scores(self.bow[kf], m.kf_valid)))
        s[kf] = -1
        s[covis[kf] > 0] = -1
        s[~np.asarray(m.kf_valid)] = -1
        cand = np.where(s >= min_score)[0]
        if len(cand) == 0:
            return []
        # accumulate over each candidate's top-10 covisibility group
        acc = {}
        for c in cand:
            wc = covis[int(c)]
            group = np.argsort(-wc)[:10]
            group = [int(g) for g in group if wc[g] > 0] + [int(c)]
            group_scores = [s[g] for g in group if s[g] > 0]
            acc[int(c)] = float(sum(group_scores)) if group_scores else float(s[c])
        best_acc = max(acc.values())
        keep = [c for c, a in acc.items() if a > 0.75 * best_acc]
        keep.sort(key=lambda c: -s[c])
        return keep[:max_candidates]

    def detect_reloc_candidates(self, m: MapState, desc: jax.Array,
                                valid: jax.Array,
                                max_candidates: int = 5) -> list[int]:
        """Relocalization candidates for a frame with the reference's
        gating (reference: DetectRelocalizationCandidates :199-309):
        accumulate each candidate's score over its top-10 covisibility
        group, keep groups above 0.75 x best accumulated score, and return
        each surviving group's best member, ordered by accumulated score.
        (The inverted file's shared-word prefilters are subsumed by the
        dense scoring: a zero-word-overlap keyframe scores 0.)"""
        vec = self.frame_vector(desc, valid)
        s = np.asarray(self.scores(vec, m.kf_valid))
        s = np.where(np.asarray(m.kf_valid), s, -1.0)
        cand = np.where(s > 0)[0]
        if len(cand) == 0:
            return []
        # No raw-score prefilter before group accumulation: the reference's
        # 0.8 gate is on shared-WORD counts (inverted-file bookkeeping) and
        # its 0.75 cut applies to ACCUMULATED group scores
        # (KeyFrameDatabase.cc:231,268-299) — a candidate with a weak
        # individual score but a strong covisibility group must survive to
        # the accumulation stage. A word-count proxy: drop only candidates
        # whose score is negligible relative to the best (guards the O(K)
        # host loop, not recall).
        cand = cand[s[cand] >= 0.05 * s[cand].max()]
        covis = np.asarray(covisibility_matrix(m))
        acc: dict[int, float] = {}
        best_of_group: dict[int, int] = {}
        for c in cand:
            wc = covis[int(c)]
            group = np.argsort(-wc)[:10]
            group = [int(g) for g in group if wc[g] > 0] + [int(c)]
            g_scores = [(s[g], g) for g in group if s[g] > 0]
            acc[int(c)] = (float(sum(v for v, _ in g_scores))
                           if g_scores else float(s[c]))
            best_of_group[int(c)] = (max(g_scores)[1] if g_scores
                                     else int(c))
        best_acc = max(acc.values())
        keep = [(a, best_of_group[c]) for c, a in acc.items()
                if a >= 0.75 * best_acc]
        keep.sort(key=lambda x: -x[0])
        out: list[int] = []
        for _, g in keep:
            if g not in out:
                out.append(g)
        return out[:max_candidates]
