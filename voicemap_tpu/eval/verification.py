"""Threshold-free verification metrics (EER / AUC) for the siamese mode.

The reference evaluates verification only through training-batch binary
accuracy and n-shot tasks (reference: ``voicemap/train.py`` metrics +
``voicemap/utils.py :: n_shot_task_evaluation``); production speaker
verification reports threshold-free metrics. This module scores balanced
same/different pairs — the reference's ``build_verification_batch`` layout,
sampled on device — and computes:

- **EER** (equal error rate): the operating point where the false-accept
  rate over different-speaker pairs equals the false-reject rate over
  same-speaker pairs, with the crossing threshold;
- **AUC**: the probability a random same-speaker pair scores closer than a
  random different-speaker pair (Mann-Whitney form, tie-corrected).

Scoring follows ``eval/nshot.py``'s policy: the trained Dense(1) head for
BCE-trained siamese models (orientation fixed so lower ⇒ same), raw
embedding euclidean distance for contrastive training (the head is never
trained there).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ExperimentConfig
from ..ops import distance as dist_ops
from ..ops import sampling
from ..train.state import TrainState
from ..train.steps import DeviceStore
from . import nshot


def eer_from_scores(
    scores: np.ndarray, labels: np.ndarray, same_label: int = 0
) -> Tuple[float, float]:
    """(EER, threshold) from pair scores where LOWER score ⇒ 'same'.

    Sweeps every observed score as an accept threshold (accept ⇔
    score ≤ t); EER is the crossing of the false-accept rate (different
    pairs accepted) and false-reject rate (same pairs rejected), midpointed
    at the closest observed operating point.
    """
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    same = np.sort(scores[labels == same_label])
    diff = np.sort(scores[labels != same_label])
    if not len(same) or not len(diff):
        raise ValueError("need both same- and different-speaker pairs")
    thr = np.unique(np.concatenate([same, diff]))
    far = np.searchsorted(diff, thr, side="right") / len(diff)
    frr = 1.0 - np.searchsorted(same, thr, side="right") / len(same)
    i = int(np.argmin(np.abs(far - frr)))
    return float((far[i] + frr[i]) / 2.0), float(thr[i])


def auc_from_scores(
    scores: np.ndarray, labels: np.ndarray, same_label: int = 0
) -> float:
    """P(same-pair score < different-pair score), ties counted half
    (Mann-Whitney U / rank form — no threshold sweep)."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels)
    same = scores[labels == same_label]
    diff = np.sort(scores[labels != same_label])
    if not len(same) or not len(diff):
        raise ValueError("need both same- and different-speaker pairs")
    lo = np.searchsorted(diff, same, side="left")
    hi = np.searchsorted(diff, same, side="right")
    wins = lo + 0.5 * (hi - lo)  # diff strictly above + half the ties
    return float((len(diff) - wins).mean() / len(diff))


def auc_stderr(auc: float, n_same: int, n_diff: int) -> float:
    """Hanley-McNeil (1982) standard error of the AUC estimate.

    The EVAL_PROTOCOL.json v2 acceptance rule's se term; exact under the
    exponential-scores assumption, a good approximation generally."""
    a = min(max(float(auc), 1e-9), 1.0 - 1e-9)
    q1 = a / (2.0 - a)
    q2 = 2.0 * a * a / (1.0 + a)
    var = (
        a * (1.0 - a)
        + (n_same - 1) * (q1 - a * a)
        + (n_diff - 1) * (q2 - a * a)
    ) / (n_same * n_diff)
    return float(np.sqrt(max(var, 0.0)))


def eer_stderr(eer: float, n_same: int, n_diff: int) -> float:
    """Binomial approximation of the EER standard error (protocol v2).

    The crossing point is estimated from both error curves (FAR over
    ``n_diff`` pairs, FRR over ``n_same``), so both sampling variances
    contribute. Slightly anti-conservative near eer→0."""
    e = min(max(float(eer), 1e-9), 1.0 - 1e-9)
    return float(np.sqrt(e * (1.0 - e) * (1.0 / n_same + 1.0 / n_diff)))


def verification_scores(
    model,
    state: TrainState,
    store: DeviceStore,
    cfg: ExperimentConfig,
    key: jax.Array,
    num_pairs: int = 1000,
    embed_batch: int = 256,
    fast: bool = False,
    qvars=None,
    same_label: Optional[int] = None,
    table=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """(scores, labels) for ``num_pairs`` balanced pairs; lower ⇒ same.

    Embeds the corpus once (deterministic fragments) and samples pairs on
    device with the training batch sampler, so the pair distribution matches
    the reference's half-alike/half-differing layout. ``table``: a
    precomputed ``nshot.embed_all`` table for this exact
    (store, cfg, fast, qvars) — skips the embedding pass.

    ``same_label`` sets only the label VALUE marking same-speaker pairs in
    the returned ``labels`` (default: ``cfg.siamese.same_label``). The
    trained head's sign convention is always taken from the cfg — the
    convention the head was TRAINED with — so relabeling pairs for an
    external manifest never flips score orientation.
    """
    if table is None:
        table = nshot.embed_all(model, state, store, cfg,
                                batch_size=embed_batch, fast=fast, qvars=qvars)
    table = np.asarray(table)
    trained_same = cfg.siamese.same_label
    out_same = trained_same if same_label is None else int(same_label)
    batch = sampling.sample_verification_batch(
        key, store.speaker_utts, store.speaker_counts, num_pairs, out_same
    )
    q = table[np.asarray(batch.idx_1)]
    s = table[np.asarray(batch.idx_2)]
    labels = np.asarray(batch.labels)

    use_head = (
        cfg.mode == "siamese"
        and cfg.train.loss != "contrastive"
        and cfg.siamese.distance_metric in dist_ops.SIAMESE_METRICS
    )
    if use_head:
        head = state.params["head"]
        logits = np.asarray(
            dist_ops.head_scores(
                jnp.asarray(q), jnp.asarray(s)[:, None, :],
                head["kernel"], head["bias"][0],
                cfg.siamese.distance_metric,
            )
        )[:, 0]
        # BCE trains sigmoid(logit) toward the label: with same=0 a LOW
        # logit means same (keep); with same=1 a HIGH logit means same
        # (negate so lower ⇒ same everywhere downstream).
        scores = logits if trained_same == 0 else -logits
    else:
        scores = np.sqrt(((q.astype(np.float64) - s) ** 2).sum(-1))
    return scores, labels


def evaluate_verification(
    model,
    state: TrainState,
    store: DeviceStore,
    cfg: ExperimentConfig,
    key: jax.Array,
    num_pairs: int = 1000,
    embed_batch: int = 256,
    fast: bool = False,
    qvars=None,
) -> Dict[str, float]:
    """One-call EER/AUC report over balanced same/different pairs."""
    scores, labels = verification_scores(
        model, state, store, cfg, key, num_pairs=num_pairs,
        embed_batch=embed_batch, fast=fast, qvars=qvars,
    )
    err, thr = eer_from_scores(scores, labels, cfg.siamese.same_label)
    return {
        "eer": err,
        "eer_threshold": thr,
        "auc": auc_from_scores(scores, labels, cfg.siamese.same_label),
        "num_pairs": int(len(labels)),
    }
