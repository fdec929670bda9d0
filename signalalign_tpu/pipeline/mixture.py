"""Gaussian-mixture modelling of per-kmer event distributions.

Re-creates the reference's ``src/signalalign/mixture_model.py`` workflow:
fit a small 1-D Gaussian mixture to the observed event means of each
canonical k-mer overlapping a modification motif, pick the component
closest to the canonical pore-model mean as the *canonical* component,
and install the remaining component as the emission distribution of the
*modified* k-mer (mixture_model.py:42-186). The reference delegates the
EM fit to sklearn's GaussianMixture; here the fit is a self-contained,
deterministic 1-D EM (quantile init) so the framework has no sklearn
dependency — the exposed attributes mirror sklearn's
(``weights_/means_/covariances_/converged_``) for drop-in familiarity.

Motif→kmer enumeration follows sequenceTools.get_motif_kmers
(sequenceTools.py:332-376) / find_modification_index_and_character
(sequenceTools.py:114-134).
"""

from __future__ import annotations

import itertools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..models.pore_model import PoreModel

__all__ = [
    "GaussianMixture1D",
    "get_nanopore_gauss_mixture",
    "find_best_1d_gaussian_fit",
    "get_mus_and_sigmas_1d",
    "closest_to_canonical",
    "fit_model_to_kmer_dist",
    "find_modification_index_and_character",
    "get_motif_kmers",
    "get_motif_kmer_pairs",
    "read_assignment_table",
    "generate_mixture_model_for_motifs",
]

_LOG_2PI = float(np.log(2.0 * np.pi))


class GaussianMixture1D:
    """Deterministic EM fit of a 1-D Gaussian mixture.

    sklearn-compatible surface for the pieces mixture_model.py uses:
    ``fit``, ``weights_``, ``means_`` (shape (n, 1)), ``covariances_``
    (shape (n, 1, 1) — variances), ``converged_``, ``score_samples``,
    ``predict_proba``, ``aic``, ``bic``.
    """

    def __init__(self, n_components: int, max_iter: int = 200,
                 tol: float = 1e-5, min_sigma: float = 1e-3):
        self.n_components = int(n_components)
        self.max_iter = int(max_iter)
        self.tol = float(tol)
        self.min_sigma = float(min_sigma)
        self.converged_ = False

    # -- fitting ---------------------------------------------------------
    def fit(self, x) -> "GaussianMixture1D":
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        n, k = len(x), self.n_components
        if n < k:
            raise ValueError(f"need >= {k} samples to fit {k} components")
        # deterministic init: component means at the (2i+1)/2k quantiles
        qs = (2 * np.arange(k) + 1) / (2.0 * k)
        mu = np.quantile(x, qs)
        sd = np.full(k, max(np.std(x) / k, self.min_sigma))
        w = np.full(k, 1.0 / k)
        prev_ll = -np.inf
        for _ in range(self.max_iter):
            # E: responsibilities (n, k) in log space
            lp = (-0.5 * ((x[:, None] - mu[None, :]) / sd[None, :]) ** 2
                  - np.log(sd)[None, :] - 0.5 * _LOG_2PI
                  + np.log(w)[None, :])
            m = lp.max(axis=1, keepdims=True)
            p = np.exp(lp - m)
            tot = p.sum(axis=1, keepdims=True)
            ll = float(np.sum(np.log(tot) + m))
            r = p / tot
            # M
            nk = r.sum(axis=0) + 1e-12
            w = nk / n
            mu = (r * x[:, None]).sum(axis=0) / nk
            var = (r * (x[:, None] - mu[None, :]) ** 2).sum(axis=0) / nk
            sd = np.maximum(np.sqrt(var), self.min_sigma)
            if abs(ll - prev_ll) < self.tol * max(1.0, abs(ll)):
                self.converged_ = True
                break
            prev_ll = ll
        else:
            # budget exhausted without meeting tol: converged_ stays
            # False (sklearn semantics — get_nanopore_gauss_mixture's
            # convergence assert can then fire, as in the reference)
            self.converged_ = False
        order = np.argsort(mu)
        self.weights_ = w[order]
        self.means_ = mu[order].reshape(-1, 1)
        self.covariances_ = (sd[order] ** 2).reshape(-1, 1, 1)
        self._ll = ll
        self._n = n
        return self

    # -- queries ---------------------------------------------------------
    @property
    def sigmas_(self) -> np.ndarray:
        return np.sqrt(self.covariances_[:, 0, 0])

    def _log_joint(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64).reshape(-1)
        mu = self.means_[:, 0]
        sd = self.sigmas_
        return (-0.5 * ((x[:, None] - mu[None, :]) / sd[None, :]) ** 2
                - np.log(sd)[None, :] - 0.5 * _LOG_2PI
                + np.log(self.weights_)[None, :])

    def score_samples(self, x) -> np.ndarray:
        lp = self._log_joint(x)
        m = lp.max(axis=1)
        return m + np.log(np.exp(lp - m[:, None]).sum(axis=1))

    def predict_proba(self, x) -> np.ndarray:
        lp = self._log_joint(x)
        p = np.exp(lp - lp.max(axis=1, keepdims=True))
        return p / p.sum(axis=1, keepdims=True)

    def _n_params(self) -> int:
        return 3 * self.n_components - 1  # weights sum to 1

    def aic(self, x) -> float:
        return 2.0 * self._n_params() - 2.0 * float(np.sum(
            self.score_samples(x)))

    def bic(self, x) -> float:
        x = np.asarray(x).reshape(-1)
        return (self._n_params() * np.log(len(x))
                - 2.0 * float(np.sum(self.score_samples(x))))


def get_nanopore_gauss_mixture(event_means,
                               n_models: int) -> GaussianMixture1D:
    """Fit ``n_models`` Gaussians to event means (mixture_model.py:42-49)."""
    model = GaussianMixture1D(n_models).fit(np.asarray(event_means).reshape(-1))
    assert model.converged_, "Model has not converged"
    return model


def find_best_1d_gaussian_fit(x, max_n: int, aic: bool = True
                              ) -> GaussianMixture1D:
    """Best of 1..max_n-1 components by AIC/BIC (mixture_model.py:52-74)."""
    x = np.asarray(x).reshape(-1)
    models = [GaussianMixture1D(n).fit(x) for n in range(1, max_n)]
    crit = [(m.aic(x) if aic else m.bic(x)) for m in models]
    return models[int(np.argmin(crit))]


def get_mus_and_sigmas_1d(model: GaussianMixture1D
                          ) -> List[Tuple[float, float]]:
    """[(mu, sigma), ...] per component (mixture_model.py:77-90)."""
    assert model.converged_, "Model has not converged"
    return [(float(mu), float(sd))
            for mu, sd in zip(model.means_[:, 0], model.sigmas_)]


def closest_to_canonical(mixture_normals: List[Tuple[float, float]],
                         canonical_mu: float):
    """Pop the component whose mean is nearest the canonical model mean;
    return (match, remaining, distance) (mixture_model.py:93-106)."""
    dists = [abs(mu - canonical_mu) for mu, _ in mixture_normals]
    i = int(np.argmin(dists))
    rest = list(mixture_normals)
    match = rest.pop(i)
    return match, rest, dists[i]


# ---------------------------------------------------------------------------
# motif -> kmer enumeration (sequenceTools.py:114-134, 332-398)
# ---------------------------------------------------------------------------

def find_modification_index_and_character(canonical_motif: str,
                                          replacement_motif: str
                                          ) -> Tuple[int, str, str]:
    canonical_motif = canonical_motif.upper()
    replacement_motif = replacement_motif.upper()
    assert canonical_motif != replacement_motif, \
        "canonical motif cannot equal replacement motif"
    assert len(canonical_motif) == len(replacement_motif)
    diffs = [i for i, (a, b) in enumerate(zip(canonical_motif,
                                              replacement_motif)) if a != b]
    assert len(diffs) == 1, "motifs must differ at exactly one position"
    pos = diffs[0]
    return pos, canonical_motif[pos], replacement_motif[pos]


def _motif_kmers_with_pos(motif_pair: Sequence[str], k: int,
                          alphabet: str = "ATGC"
                          ) -> List[Tuple[str, int]]:
    """(kmer, position of the modified base within the kmer) for every
    k-mer window covering the modified motif position, with flanking
    completions over ``alphabet``. The position is tracked during
    enumeration — re-deriving it with ``kmer.find(mod_char)`` picks the
    wrong slot when the modification character also occurs earlier in
    the kmer (a bug inherited by the reference, mixture_model.py:197)."""
    assert len(motif_pair) == 2
    canonical, modified = motif_pair[0].upper(), motif_pair[1].upper()
    mod_index, _, _ = find_modification_index_and_character(canonical,
                                                            modified)
    L = len(modified)
    out: List[Tuple[str, int]] = []
    seen = set()
    # kmer window starts at motif coordinate s, covering the mod position
    for s in range(mod_index - k + 1, mod_index + 1):
        core = modified[max(s, 0):min(s + k, L)]
        n_front = max(0, -s)
        n_back = max(0, s + k - L)
        for front in itertools.product(alphabet, repeat=n_front):
            for back in itertools.product(alphabet, repeat=n_back):
                kmer = "".join(front) + core + "".join(back)
                if kmer not in seen:
                    seen.add(kmer)
                    out.append((kmer, mod_index - s))
    return out


def get_motif_kmers(motif_pair: Sequence[str], k: int,
                    alphabet: str = "ATGC") -> List[str]:
    """All k-mers covering the modified position of the motif, with every
    flanking completion over ``alphabet`` (sequenceTools.py:332-376)."""
    return [kmer for kmer, _ in _motif_kmers_with_pos(motif_pair, k,
                                                      alphabet)]


def get_motif_kmer_pairs(motif_pair: Sequence[str], k: int,
                         alphabet: str = "ATGC") -> List[List[str]]:
    """[[canonical_kmer, modified_kmer], ...] (mixture_model.py:189-200),
    reverting the tracked modification slot rather than the first
    occurrence of the modification character."""
    _, old_char, _ = find_modification_index_and_character(
        motif_pair[0], motif_pair[1])
    pairs = []
    for new_kmer, pos in _motif_kmers_with_pos(motif_pair, k,
                                               alphabet=alphabet):
        pairs.append([new_kmer[:pos] + old_char + new_kmer[pos + 1:],
                      new_kmer])
    return pairs


# ---------------------------------------------------------------------------
# assignment tables
# ---------------------------------------------------------------------------

def read_assignment_table(path: str) -> Dict[str, np.ndarray]:
    """Read a buildAlignment/assignments TSV (``kmer strand mean [prob]``)
    into {(strand, kmer): event means} (parse_assignment_file semantics,
    hiddenMarkovModel.py)."""
    table: Dict[str, list] = {}
    with open(path) as fh:
        for line in fh:
            parts = line.rstrip("\n").split("\t")
            if len(parts) < 3:
                continue
            key = (parts[1], parts[0])
            table.setdefault(key, []).append(float(parts[2]))
    return {k: np.asarray(v) for k, v in table.items()}


def fit_model_to_kmer_dist(assignments: Dict[Tuple[str, str], np.ndarray],
                           kmer: str, strand: str = "t",
                           n_normals: int = 2
                           ) -> Optional[GaussianMixture1D]:
    """Mixture fit for one kmer's event means (mixture_model.py:108-120)."""
    samples = assignments.get((strand, kmer))
    if samples is None or len(samples) < n_normals:
        return None
    return get_nanopore_gauss_mixture(samples, n_normals)


# ---------------------------------------------------------------------------
# model generation
# ---------------------------------------------------------------------------

def generate_mixture_model_for_motifs(
        model: PoreModel,
        assignments: Dict[Tuple[str, str], np.ndarray],
        all_kmer_pairs: Sequence[Sequence[str]],
        strand: str = "t",
        output_dir: Optional[str] = None,
        name: str = "",
        plot: bool = False,
        n_normals: int = 2):
    """Install modified-kmer emission params from per-kmer mixture fits.

    For every (canonical, modified) kmer pair: fit ``n_normals`` Gaussians
    to the canonical kmer's observed event means, take the component
    closest to the pore-model mean as canonical, and write the *other*
    component's (mu, sigma) into the modified kmer's model slot
    (mixture_model.py:124-186). Returns the rows of the distances table;
    writes ``{strand}_{name}mixture_model.hmm`` and
    ``{strand}_distances.tsv`` when ``output_dir`` is given.
    """
    rows = []
    for old_kmer, new_kmer in all_kmer_pairs:
        mix = fit_model_to_kmer_dist(assignments, old_kmer, strand=strand,
                                     n_normals=n_normals)
        if mix is None:
            continue
        normals = get_mus_and_sigmas_1d(mix)
        ki = model.alphabet.kmer_index(old_kmer)
        kmer_mean = float(model.level_mean[ki])
        kmer_sd = float(model.level_sd[ki])
        match, others, distance = closest_to_canonical(normals, kmer_mean)
        new_mu, new_sd = others[0]
        kj = model.alphabet.kmer_index(new_kmer)
        model.level_mean[kj] = new_mu
        model.level_sd[kj] = new_sd
        rows.append((old_kmer, kmer_mean, kmer_sd, match[0], match[1],
                     new_mu, new_sd, distance, strand))
        if plot and output_dir:
            from ..visualization import plot_mixture_fit
            plot_mixture_fit(
                old_kmer, new_kmer, kmer_mean, kmer_sd, match, (new_mu,
                                                                new_sd),
                mix, assignments.get((strand, old_kmer)),
                os.path.join(output_dir,
                             f"{old_kmer}_{new_kmer}_{strand}_mixture.png"))
    rows.sort(key=lambda r: -r[7])
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        prefix = f"{name}_" if name else ""
        model.write(os.path.join(output_dir,
                                 f"{strand}_{prefix}mixture_model.hmm"))
        with open(os.path.join(output_dir,
                               f"{strand}_distances.tsv"), "w") as fh:
            fh.write("kmer\tcanonical_model_mean\tcanonical_model_sd"
                     "\tcanonical_mixture_mean\tcanonical_mixture_sd"
                     "\tmodified_mixture_mean\tmodified_mixture_sd"
                     "\tdistance\tstrand\n")
            for r in rows:
                fh.write("\t".join(str(v) for v in r) + "\n")
    return rows
