"""Context/target splitters producing padded + masked splits.

Parity target: /root/reference/npf/utils/datasplit.py — index samplers
`get_all_indcs` (:30), `GetRangeIndcs` (:37), `GetRandomIndcs` (:60-145:
uniform count in [a,b] shared across the batch, ratio-or-absolute,
per-element-independent index choice :129-139, beta-binomial option :117-119,
uniform-support mixing `proba_uniform` :112-114), `CntxtTrgtGetter`
(:148-255), grid maskers `RandomMasker` (:259), `half_masker` (:319),
`no_masker` (:329), and `GridCntxtTrgtSplitter` (:336-452: grid mask ->
normalized [-1,1] coords, `upscale_factor` for zero-shot extrapolation :447).

TPU-first redesign: instead of gathering variable-size subsets (ragged), the
splitter emits BOOLEAN MASKS over the fixed point set — context = (X, Y,
mask_cntxt), target = (X, Y, mask_trgt). Shapes are static under jit; the
whole splitter is jittable and runs on device as part of the input pipeline.
Like the reference, the *count* of context points is by default shared across
a batch (one randint per batch) while the *positions* are independent per
element; `GetRandomIndcs.is_indep_n` switches to per-element counts (used by
the eval protocol — see that docstring).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..utils.helpers import ratio_to_int

__all__ = [
    "get_all_indcs",
    "GetIndcsMerger",
    "get_range_indcs",
    "GetRandomIndcs",
    "CntxtTrgtSplitter",
    "RandomMasker",
    "half_masker",
    "no_masker",
    "GridCntxtTrgtSplitter",
]


# ------------------------------------------------------------ mask samplers
# a "mask sampler" has signature (key, batch_size, n_points) -> bool [B, N]


def get_all_indcs(key, batch_size, n_points):
    """All points selected (ref datasplit.py:30-34)."""
    return jnp.ones((batch_size, n_points), dtype=bool)


def get_range_indcs(arange: Tuple[int, int]):
    """All indices in [lo, hi) (ref datasplit.py:37-45)."""

    def sampler(key, batch_size, n_points):
        idx = jnp.arange(n_points)
        mask = (idx >= arange[0]) & (idx < arange[1])
        return jnp.broadcast_to(mask[None], (batch_size, n_points))

    return sampler


@dataclass(frozen=True)
class GetIndcsMerger:
    """Union of several mask samplers (ref GetIndcsMerger, datasplit.py:48-57
    — index concatenation becomes mask union in the padded world)."""

    samplers: tuple

    def __call__(self, key, batch_size, n_points):
        masks = [
            s(k, batch_size, n_points)
            for s, k in zip(self.samplers, jax.random.split(key, len(self.samplers)))
        ]
        out = masks[0]
        for m in masks[1:]:
            out = out | m
        return out


@dataclass(frozen=True)
class GetRandomIndcs:
    """Random subset mask: count n ~ U{a..b} (or beta-binomial), positions
    independent per batch element (ref datasplit.py:60-145)."""

    a: float = 0.1
    b: float = 0.5
    is_batch_share: bool = False
    is_ensure_one: bool = False
    is_beta_binomial: bool = False
    proba_uniform: float = 0.0
    # draw the count independently PER BATCH ELEMENT instead of once per
    # batch. The reference shares one count per batch (datasplit.py:129-139,
    # a torch-gather equal-sizes constraint masks don't have); the marginal
    # count distribution — and hence the expected eval LL — is identical,
    # but per-element draws estimate it without per-batch count noise.
    # Use at EVAL: a 10k-function eval in 256-sized batches otherwise rests
    # on only ~39 count draws (measured realized mean 28.5 vs nominal 25,
    # inflating every recorded LL for context-hungry models).
    is_indep_n: bool = False

    def __call__(self, key, batch_size, n_points):
        k_n, k_u, k_choice, k_perm = jax.random.split(key, 4)

        # static upper bound on the count when it is knowable at trace time
        # (plain uniform draw, no beta-binomial / proba_uniform resampling):
        # enables the O(N*b) top_k mask construction below in place of the
        # O(N log^2 N) full-sort ranks — ~7x less split time at the
        # flagship shape (b=64 of N=256), bit-identical masks
        # (results/step_variants.json A/B; equality pinned in tests).
        # ratio-or-absolute, clamped to the available points so a splitter
        # configured for long functions (e.g. b=50) still works on shorter
        # ones. One helper shared by the static bound and the dynamic draw
        # so the two can't diverge.
        def to_count(v):
            c = int(v * n_points) if 0 <= v < 1 else int(v)
            return max(0, min(c, n_points))

        static_ub = None
        if not self.is_beta_binomial and self.proba_uniform <= 0:
            ub = to_count(self.b)
            if self.is_ensure_one:
                ub = max(ub, 1)
            if ub < n_points:
                static_ub = ub

        if self.is_beta_binomial:
            # compound beta-binomial: p ~ Beta(a, b); n ~ Binomial(N, p)
            kp, kb = jax.random.split(k_n)
            p = jax.random.beta(kp, self.a, self.b)
            n_indcs = jnp.sum(
                jax.random.uniform(kb, (n_points,)) < p
            )
        else:
            a, b = to_count(self.a), to_count(self.b)
            a = min(a, b)
            n_shape = (batch_size, 1) if self.is_indep_n else ()
            n_indcs = jax.random.randint(k_n, n_shape, a, b + 1)

        # with prob proba_uniform, resample count uniformly over all sizes
        if self.proba_uniform > 0:
            ku1, ku2 = jax.random.split(k_u)
            n_uni = jax.random.randint(ku1, (), 0, n_points + 1)
            use_uni = jax.random.uniform(ku2, ()) < self.proba_uniform
            n_indcs = jnp.where(use_uni, n_uni, n_indcs)

        if self.is_ensure_one:
            n_indcs = jnp.maximum(n_indcs, 1)

        # independent positions per element: the n lowest-scoring points of
        # iid uniform scores (any exact-n subset is equally likely)
        shape = (1, n_points) if self.is_batch_share else (batch_size, n_points)
        scores = jax.random.uniform(k_perm, shape)
        if static_ub is not None:
            if static_ub == 0:
                return jnp.zeros((batch_size, n_points), bool)
            return exact_topn_mask(scores, n_indcs, static_ub, batch_size)
        ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
        mask = ranks < n_indcs
        if self.is_batch_share:
            mask = jnp.broadcast_to(mask, (batch_size, n_points))
        return mask


def exact_topn_mask(scores, n_indcs, static_ub, batch_size):
    """Boolean mask of the n smallest-scoring positions per row, EXACTLY the
    set the stable double-argsort rank construction selects (ties broken
    lower-index-first), built scatter-free.

    Mechanism: `top_k(-scores, ub)` yields the ub smallest scores ascending
    (equal values ordered by ascending index — the property the previous
    scatter construction already relied on). The n-th smallest (value, index)
    pair is then a LEXICOGRAPHIC threshold: a position belongs to the mask
    iff score < thr_val, or score == thr_val and index <= thr_idx. A plain
    value threshold alone would over-select when f32 score ties span the
    count boundary (~1.5e-5/row at N=256); the index tiebreak restores
    bit-exactness. Replaces the XLA scatter (`.at[rows, idx].set`) with two
    vector compares: 180.5us -> ~72us at the flagship mask shape
    (results/step_variants.json topk_scatter vs topk_threshold rows).

    scores: [S, N] with S in {1, batch_size}; n_indcs: scalar or [B, 1].
    """
    n_points = scores.shape[-1]
    neg_vals, idx = jax.lax.top_k(-scores, static_ub)
    vals = -neg_vals  # ascending
    n_b = jnp.broadcast_to(n_indcs, (batch_size, 1))
    sel_pos = jnp.clip(n_b - 1, 0, static_ub - 1)
    vals_b = jnp.broadcast_to(vals, (batch_size, static_ub))
    idx_b = jnp.broadcast_to(idx, (batch_size, static_ub))
    thr_val = jnp.take_along_axis(vals_b, sel_pos, axis=-1)  # [B, 1]
    thr_idx = jnp.take_along_axis(idx_b, sel_pos, axis=-1)  # [B, 1]
    ar = jnp.arange(n_points)[None, :]
    scores_b = jnp.broadcast_to(scores, (batch_size, n_points))
    mask = (scores_b < thr_val) | ((scores_b == thr_val) & (ar <= thr_idx))
    return mask & (n_b > 0)


@dataclass(frozen=True)
class CntxtTrgtSplitter:
    """Split a batch of functions into masked context/target sets
    (ref CntxtTrgtGetter, datasplit.py:148-255).

    Returns dict(X_cntxt, Y_cntxt, mask_cntxt, X_trgt, Y_trgt, mask_trgt):
    X/Y are shared full arrays, masks carry the split. `is_add_cntxts_to_trgts`
    unions the context mask into the target mask.
    """

    contexts_getter: Callable = GetRandomIndcs()
    targets_getter: Callable = get_all_indcs
    is_add_cntxts_to_trgts: bool = False
    # duplicate the batch with independent splits of the SAME functions —
    # the reference's `is_duplicate_batch` collate trick feeding UnetCNN's
    # shared-bottleneck averaging (dataloader.py:20-35, cnn.py:466-475)
    is_duplicate_batch: bool = False

    def __call__(self, key, x, y, condition=None):
        if self.is_duplicate_batch:
            x = jnp.concatenate([x, x], axis=0)
            y = jnp.concatenate([y, y], axis=0)
            if condition is not None:
                condition = jnp.concatenate([condition, condition], axis=0)
        B, N = x.shape[0], x.shape[1]
        kc, kt = jax.random.split(key)
        mask_cntxt = self.contexts_getter(kc, B, N)
        mask_trgt = self.targets_getter(kt, B, N)
        if self.is_add_cntxts_to_trgts:
            mask_trgt = mask_trgt | mask_cntxt
        batch = dict(
            X_cntxt=x,
            Y_cntxt=y,
            mask_cntxt=mask_cntxt,
            X_trgt=x,
            Y_trgt=y,
            mask_trgt=mask_trgt,
        )
        if condition is not None:
            batch["condition"] = condition
        return batch


# ------------------------------------------------------------ grid maskers
# a "grid masker" has signature (key, batch_size, grid_shape) -> bool [B, *grid]


@dataclass(frozen=True)
class RandomMasker:
    """Random boolean grid mask with n ~ U{a..b} selected pixels
    (ref datasplit.py:259-298)."""

    a: float = 0.1
    b: float = 0.5
    is_batch_share: bool = False
    is_indep_n: bool = False  # per-image count draws (see GetRandomIndcs)

    def __call__(self, key, batch_size, grid_shape):
        n_pix = 1
        for s in grid_shape:
            n_pix *= s
        flat = GetRandomIndcs(
            a=self.a,
            b=self.b,
            is_batch_share=self.is_batch_share,
            is_indep_n=self.is_indep_n,
        )(key, batch_size, n_pix)
        return flat.reshape((batch_size,) + tuple(grid_shape))


def no_masker(key, batch_size, grid_shape):
    """Everything selected (ref datasplit.py:329-333)."""
    return jnp.ones((batch_size,) + tuple(grid_shape), dtype=bool)


@dataclass(frozen=True)
class ResolutionMasker:
    """Select every k-th pixel along each axis — a regular low-resolution
    subsampling mask (ref datasplit.py:281-298)."""

    factor: int = 2

    def __call__(self, key, batch_size, grid_shape):
        mask = jnp.zeros(grid_shape, dtype=bool)
        idx = tuple(slice(None, None, self.factor) for _ in grid_shape)
        mask = mask.at[idx].set(True)
        return jnp.broadcast_to(mask[None], (batch_size,) + tuple(grid_shape))


def half_masker(key, batch_size, grid_shape, dim=0):
    """Mask the first half along `dim` (ref datasplit.py:319-326)."""
    mask = jnp.zeros(grid_shape, dtype=bool)
    idx = [slice(None)] * len(grid_shape)
    idx[dim] = slice(0, grid_shape[dim] // 2)
    mask = mask.at[tuple(idx)].set(True)
    return jnp.broadcast_to(mask[None], (batch_size,) + tuple(grid_shape))


@dataclass(frozen=True)
class GridCntxtTrgtSplitter:
    """Grid version: produce context/target grid masks, and (for off-grid
    models) the corresponding normalized coordinates in [-1,1]
    (ref GridCntxtTrgtGetter, datasplit.py:336-452).

    For Grid* models use the masks directly; for point-set models call
    `grid_to_points` to convert an image + mask into padded point sets.
    """

    context_masker: Callable = RandomMasker()
    target_masker: Callable = no_masker
    upscale_factor: float = 1.0

    def __call__(self, key, y_grid, y=None):
        """y_grid [B, *grid, y_dim] -> dict with grid masks + coords.
        Accepts (key, x, y) like CntxtTrgtSplitter; x is the image there."""
        if y is not None:
            y_grid = y
        B = y_grid.shape[0]
        grid_shape = y_grid.shape[1:-1]
        kc, kt = jax.random.split(key)
        mask_cntxt = self.context_masker(kc, B, grid_shape)
        mask_trgt = self.target_masker(kt, B, grid_shape)
        return dict(
            X_cntxt=mask_cntxt[..., None],  # grid-model convention: X = mask
            Y_cntxt=y_grid,
            mask_cntxt=mask_cntxt,
            X_trgt=mask_trgt[..., None],
            Y_trgt=y_grid,
            mask_trgt=mask_trgt,
        )

    def coords(self, grid_shape) -> jax.Array:
        """Normalized [-1,1] coordinates of every grid position
        (ref datasplit.py:437-452), MULTIPLIED by upscale_factor for
        zero-shot extrapolation (:447 `X_masked *= self.upscale_factor`):
        a larger test canvas keeps the train pixel spacing, so its coords
        extend beyond [-1,1]."""
        axes = [
            jnp.linspace(-1.0, 1.0, s) * self.upscale_factor for s in grid_shape
        ]
        mesh = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        return mesh.reshape(-1, len(grid_shape))  # [prod(grid), ndim]


@dataclass(frozen=True)
class SuperresolutionCntxtTrgtSplitter:
    """Super-resolution task: the DOWNSAMPLED image is the context (as a
    regular-subsampling mask), the full-resolution grid the target
    (ref SuperresolutionCntxtTrgtGetter, datasplit.py:455-490)."""

    resolution_factor: int = 2

    def __call__(self, key, y_grid, y=None):
        if y is not None:
            y_grid = y
        B = y_grid.shape[0]
        grid_shape = y_grid.shape[1:-1]
        mask_cntxt = ResolutionMasker(self.resolution_factor)(key, B, grid_shape)
        return dict(
            X_cntxt=mask_cntxt[..., None],
            Y_cntxt=y_grid,
            mask_cntxt=mask_cntxt,
            X_trgt=jnp.ones((B,) + tuple(grid_shape) + (1,), y_grid.dtype),
            Y_trgt=y_grid,
            mask_trgt=jnp.ones((B,) + tuple(grid_shape), bool),
        )


@dataclass(frozen=True)
class PointsFromGridSplitter:
    """Grid batch -> padded POINT sets for off-grid models (CNP/AttnCNP/LNP)
    trained on image grids — the reference feeds point models with
    `cntxt_trgt_collate(GridCntxtTrgtGetter(...))` (ref dataloader.py:6-37 +
    datasplit.py:336-452). Context pixels come from `context_masker`; the
    target set is ALL pixels (ref no_masker target in the image notebooks).
    Coordinates follow the reference normalization: per-canvas [-1,1] THEN
    multiplied by `upscale_factor` (ref datasplit.py:447), so a larger
    zero-shot test canvas yields extrapolative coords beyond [-1,1].
    Static shapes: both sets are padded to the full pixel count."""

    context_masker: Callable = RandomMasker()
    upscale_factor: float = 1.0

    def __call__(self, key, y_grid, y=None):
        if y is not None:
            y_grid = y
        B = y_grid.shape[0]
        grid_shape = y_grid.shape[1:-1]
        n_pix = 1
        for s in grid_shape:
            n_pix *= s
        mask_cntxt = self.context_masker(key, B, grid_shape)
        xc, yc, mc = grid_to_points(
            y_grid, mask_cntxt, n_pix, self.upscale_factor
        )
        full = jnp.ones((B,) + tuple(grid_shape), bool)
        xt, yt, mt = grid_to_points(y_grid, full, n_pix, self.upscale_factor)
        return dict(
            X_cntxt=xc,
            Y_cntxt=yc,
            mask_cntxt=mc,
            X_trgt=xt,
            Y_trgt=yt,
            mask_trgt=mt,
        )


def grid_to_points(y_grid, mask, n_max: int, upscale_factor: float = 1.0):
    """Convert (image, boolean mask) into a padded point set of at most n_max
    points with coordinates in [-1,1] (ref visualize_imgs points_to_grid /
    GridCntxtTrgtGetter). Deterministic: selects masked-in pixels in raster
    order. Returns (x [B, n_max, ndim], y [B, n_max, y_dim], mask [B, n_max])."""
    B = y_grid.shape[0]
    grid_shape = y_grid.shape[1:-1]
    y_dim = y_grid.shape[-1]
    ndim = len(grid_shape)
    n_pix = 1
    for s in grid_shape:
        n_pix *= s

    # ref datasplit.py:447: coords normalized per-canvas then scaled UP so a
    # larger test canvas keeps the train pixel spacing (extrapolative range)
    axes = [jnp.linspace(-1.0, 1.0, s) * upscale_factor for s in grid_shape]
    coords = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1).reshape(
        n_pix, ndim
    )

    flat_mask = mask.reshape(B, n_pix)
    flat_y = y_grid.reshape(B, n_pix, y_dim)

    # stable order: masked-in pixels first
    order = jnp.argsort(~flat_mask, axis=-1, stable=True)[:, :n_max]  # [B, n_max]
    x = coords[order]  # [B, n_max, ndim]
    y = jnp.take_along_axis(flat_y, order[..., None], axis=1)
    m = jnp.take_along_axis(flat_mask, order, axis=1)
    return x, y, m
