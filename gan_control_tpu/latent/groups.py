"""Latent partitioning + disentanglement batch arrangement (L3).

The disentanglement engine of GAN-Control: the 512-d latent is split into
contiguous per-attribute sub-vectors, and each training mini-batch is
arranged so specific *pairs of rows share* one attribute's sub-latent
(behavior contract: utils/mini_batch_multi_split_utils.py:19-115 in the
reference).

TPU-first design: instead of in-place tensor writes inside a Python loop,
the arrangement is a single functional gather built from a static group
table — `z_out = where(mask, z[pair_src_row], z)` — fully jittable with
static shapes. The table (`GroupSpec`) is a frozen, hashable dataclass, so
it can be a static argument of a jitted train step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class LatentGroup:
    """One attribute sub-space.

    latent_[start,end) — slice of the 512-d latent owned by this attribute
      (reference: sub_groups_dict[*]['place_in_latent'], configs/ffhq.json:35-71).
    mb_[start,end) — rows of the mini-batch whose consecutive even/odd pairs
      share this group's sub-latent (place_in_mini_batch). None = group never
      gets shared pairs (evaluation-only groups).
    count_range — (min, max) slots for the randomized arrangement mode
      (count_in_mini_bach in the reference config).
    """

    name: str
    latent_start: int
    latent_end: int
    mb_start: int | None = None
    mb_end: int | None = None
    count_range: tuple[int, int] | None = None

    @property
    def latent_size(self) -> int:
        return self.latent_end - self.latent_start

    @property
    def latent_slice(self) -> slice:
        return slice(self.latent_start, self.latent_end)


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    """Ordered (by latent offset) immutable table of latent groups.

    Mirrors MiniBatchUtils + FcConfig in one object (reference:
    mini_batch_multi_split_utils.py:13-17, 19-54, 103-115).
    """

    groups: tuple[LatentGroup, ...]
    mini_batch: int
    style_dim: int = 512

    def __post_init__(self):
        latent_total = sum(g.latent_size for g in self.groups)
        if latent_total != self.style_dim:
            raise ValueError(
                f"latent sizes sum to {latent_total}, expected {self.style_dim}"
            )
        mb_total = sum(
            g.mb_end - g.mb_start for g in self.groups if g.mb_start is not None
        )
        if mb_total and mb_total != self.mini_batch:
            raise ValueError(
                f"mini-batch slots sum to {mb_total}, expected {self.mini_batch}"
            )
        starts = [g.latent_start for g in self.groups]
        if starts != sorted(starts):
            raise ValueError("groups must be ordered by latent_start")

    # -- construction -------------------------------------------------------

    @classmethod
    def from_config(
        cls, sub_groups_dict: Mapping[str, Mapping], mini_batch: int, style_dim: int = 512
    ) -> "GroupSpec":
        """Build from the JSON `sub_groups_dict` schema (configs/ffhq.json:35-71)."""
        groups = []
        for name, g in sub_groups_dict.items():
            pim = g.get("place_in_mini_batch")
            cnt = g.get("count_in_mini_bach") or g.get("count_in_mini_batch")
            groups.append(
                LatentGroup(
                    name=name,
                    latent_start=g["place_in_latent"][0],
                    latent_end=g["place_in_latent"][1],
                    mb_start=None if pim is None else pim[0],
                    mb_end=None if pim is None else pim[1],
                    count_range=None if cnt is None else (cnt[0], cnt[1]),
                )
            )
        groups.sort(key=lambda g: g.latent_start)
        return cls(groups=tuple(groups), mini_batch=mini_batch, style_dim=style_dim)

    # -- lookups -------------------------------------------------------------

    @property
    def names(self) -> tuple[str, ...]:
        return tuple(g.name for g in self.groups)

    def group(self, name: str) -> LatentGroup:
        for g in self.groups:
            if g.name == name:
                return g
        raise KeyError(name)

    def fc_dims(self) -> tuple[tuple[str, int], ...]:
        """(name, latent_size) pairs feeding the split mapping network."""
        return tuple((g.name, g.latent_size) for g in self.groups)

    # -- static arrangement tables -------------------------------------------

    def pair_source_rows(self) -> np.ndarray:
        """row -> source row for the share-copy. Odd rows inside a group's
        mini-batch slots point at the preceding even row; all others at
        themselves."""
        src = np.arange(self.mini_batch)
        for g in self.groups:
            if g.mb_start is None:
                continue
            for i in range(g.mb_start, g.mb_end, 2):
                if i + 1 < g.mb_end:
                    src[i + 1] = i
        return src

    def share_mask(self) -> np.ndarray:
        """[mini_batch, style_dim] bool: positions overwritten from the pair
        source row (odd row of a group pair, that group's latent columns)."""
        mask = np.zeros((self.mini_batch, self.style_dim), dtype=bool)
        for g in self.groups:
            if g.mb_start is None:
                continue
            for i in range(g.mb_start, g.mb_end, 2):
                if i + 1 < g.mb_end:
                    mask[i + 1, g.latent_start : g.latent_end] = True
        return mask


# ---------------------------------------------------------------------------
# Functional arrangement ops (pure; GroupSpec static)
# ---------------------------------------------------------------------------


def re_arrange_z(spec: GroupSpec, z_list: Sequence[jax.Array]) -> list[jax.Array]:
    """Arrange a mini-batch of latents so even/odd pairs inside each group's
    slot range share that group's sub-latent.

    Behavior contract: MiniBatchUtils.re_arrange_z
    (mini_batch_multi_split_utils.py:64-78): copy each group's latent slice
    from even row -> following odd row; with style mixing (len>1) the second
    z equals the first everywhere except inside the 'other' group's
    mini-batch slots.
    """
    z0 = z_list[0]
    src = jnp.asarray(spec.pair_source_rows())
    mask = jnp.asarray(spec.share_mask())
    z0 = jnp.where(mask, z0[src], z0)

    out = [z0]
    if len(z_list) > 1:
        other = next((g for g in spec.groups if g.name == "other"), None)
        for zi in z_list[1:]:
            if other is not None and other.mb_start is not None:
                rows = jnp.arange(z0.shape[0])
                keep_second = (rows >= other.mb_start) & (rows < other.mb_end)
                out.append(jnp.where(keep_second[:, None], zi, z0))
            else:
                out.append(z0)
    return out


def re_arrange_inject_noise(
    spec: GroupSpec, noises: Sequence[jax.Array], group_name: str = "id"
) -> list[jax.Array]:
    """Copy per-layer injection noise from even -> odd rows inside one
    group's slots ('same_for_same_id' noise mode; reference
    mini_batch_multi_split_utils.py:97-101). Noise layout: [B, H, W, 1]."""
    g = spec.group(group_name)
    src = np.arange(spec.mini_batch)
    for i in range(g.mb_start, g.mb_end, 2):
        if i + 1 < g.mb_end:
            src[i + 1] = i
    src = jnp.asarray(src)
    return [n[src] for n in noises]


def same_not_same_split(
    spec: GroupSpec, features: jax.Array, group_name: str
) -> tuple[jax.Array, jax.Array]:
    """Split a [mini_batch, ...] tensor into the rows belonging to a group's
    slots (same) and all other rows (not_same), preserving order.

    Contract: get_sub_group / get_not_sub_group + extract_same_not_same
    (mini_batch_multi_split_utils.py:56-62, 80-86). Static slicing - shapes
    are fixed by the spec.
    """
    g = spec.group(group_name)
    same = features[g.mb_start : g.mb_end]
    not_same = jnp.concatenate([features[: g.mb_start], features[g.mb_end :]], axis=0)
    return same, not_same


def extract_group_latent(spec: GroupSpec, latent: jax.Array, group_name: str) -> jax.Array:
    """Slice one group's sub-latent out of w ([B,512]) or w+ ([B,L,512])."""
    g = spec.group(group_name)
    return latent[..., g.latent_start : g.latent_end]


def insert_group_latent(
    spec: GroupSpec, latent: jax.Array, group_latent: jax.Array, group_name: str
) -> jax.Array:
    """Replace one group's sub-latent inside w ([B,512]) or w+ ([B,L,512]).

    Contract: Controller.insert_group_w_latent (inference/controller.py:60-71).
    For w+, the same group value is broadcast to every layer.
    """
    g = spec.group(group_name)
    if latent.ndim == 3 and group_latent.ndim == 2:
        group_latent = group_latent[:, None, :]
    return latent.at[..., g.latent_start : g.latent_end].set(
        jnp.broadcast_to(group_latent, latent[..., g.latent_start : g.latent_end].shape)
    )


def random_placements(
    spec: GroupSpec, rng: np.random.Generator
) -> dict[str, list[int]]:
    """Draw a fresh random slot placement for every group (host-side, per
    step), as {group: sorted even slot starts} — each start s places the
    arranged pair (s, s+1).

    Behavior contract: RandomMiniBatchUtils.randomize_places_in_batch
    (mini_batch_random_multi_split_utils.py:45-68), draw-for-draw:
      - each group with a count_range draws an even size uniformly from
        arange(lo, hi+2, 2) and then ``size//2`` even slot starts WITHOUT
        replacement — but INDEPENDENTLY of every other group: placements
        may overlap across groups (a pair can share several groups'
        sub-latents at once) and need not cover the mini-batch (some rows
        belong to no group that step);
      - a group without a count_range keeps its STATIC placement (the
        reference leaves place_in_mini_batch untouched for those).
    """
    placements: dict[str, list[int]] = {}
    even_slots = np.arange(0, spec.mini_batch, 2)
    for g in spec.groups:
        if g.count_range is None:
            placements[g.name] = (
                list(range(g.mb_start, g.mb_end, 2))
                if g.mb_start is not None else []
            )
            continue
        lo, hi = g.count_range
        size = int(rng.choice(np.arange(lo, hi + 2, 2)))
        starts: list[int] = []
        if size > 0:
            starts = sorted(
                int(v) for v in rng.choice(even_slots, size // 2, replace=False)
            )
        placements[g.name] = starts
    return placements


# ---------------------------------------------------------------------------
# Array-valued arrangement (recompile-free per-step randomization)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Arrangement:
    """The batch arrangement as ARRAYS, so a per-step random placement can be
    fed into ONE compiled train step with zero recompiles (the TPU-native
    replacement for RandomMiniBatchUtils' per-iteration slot shuffling,
    reference utils/mini_batch_random_multi_split_utils.py:45-68).

    All members are per-mini-batch-chunk shaped; the train step applies the
    same arrangement to every chunk of the global batch.

    pair_src: [mini_batch] int32 — row -> source row for the share-copy
      (odd rows of a group's slot pairs point at the preceding even row).
    share_mask: [mini_batch, style_dim] bool — latent positions overwritten
      from ``pair_src`` (each odd pair row, its group's latent columns).
    noise_pair_src: [mini_batch] int32 — pairing for the 'id' group only
      ('same_for_same_id' injection-noise sharing).
    same_pair_masks: {group: [mini_batch, mini_batch] bool} — entry
      [odd, even] marked for each of that group's slot pairs. Because every
      pairwise distance used by the criterion is symmetric, marking the
      strictly-lower (odd, even) entry reproduces the reference's
      reorder-then-lower-triangle bookkeeping without any reordering.
    not_same_pair_masks: {group: [mini_batch, mini_batch] bool} — the
      group's "not-same" pairs: its COMPLEMENT rows (rows outside every
      one of its pairs) taken in batch order and paired by adjacency,
      entry [later, earlier] — exactly the reference's
      get_not_sub_group + make_not_same_last_layer_mask bookkeeping
      (loss_model.py:183-198). For a static covering placement these are
      precisely the other groups' pairs; for the randomized mode (where
      placements may overlap or leave rows unpaired) the adjacency
      pairing reproduces the reference's distribution.
    """

    pair_src: Any
    share_mask: Any
    noise_pair_src: Any
    same_pair_masks: dict
    not_same_pair_masks: dict


jax.tree_util.register_dataclass(
    Arrangement,
    data_fields=["pair_src", "share_mask", "noise_pair_src",
                 "same_pair_masks", "not_same_pair_masks"],
    meta_fields=[],
)


def arrangement_from_placements(
    spec: GroupSpec, placements: dict[str, list[int]], noise_group: str = "id"
) -> Arrangement:
    """Materialize {group: even slot starts} as Arrangement arrays."""
    n = spec.mini_batch
    pair_src = np.arange(n, dtype=np.int32)
    share = np.zeros((n, spec.style_dim), dtype=bool)
    noise_src = np.arange(n, dtype=np.int32)
    same_masks, not_same_masks = {}, {}
    for g in spec.groups:
        starts = placements.get(g.name, [])
        m = np.zeros((n, n), dtype=bool)
        in_group = np.zeros((n,), dtype=bool)
        for s0 in starts:
            m[s0 + 1, s0] = True
            in_group[s0] = in_group[s0 + 1] = True
            pair_src[s0 + 1] = s0
            share[s0 + 1, g.latent_start : g.latent_end] = True
            if g.name == noise_group:
                noise_src[s0 + 1] = s0
        same_masks[g.name] = m
        # complement rows in batch order, paired by adjacency (reference
        # get_not_sub_group + make_not_same_last_layer_mask)
        comp = np.flatnonzero(~in_group)
        nm = np.zeros((n, n), dtype=bool)
        for a, b in zip(comp[0::2], comp[1::2]):
            nm[max(a, b), min(a, b)] = True
        not_same_masks[g.name] = nm
    return Arrangement(
        pair_src=pair_src,
        share_mask=share,
        noise_pair_src=noise_src,
        same_pair_masks=same_masks,
        not_same_pair_masks=not_same_masks,
    )


def arrangement_from_spec(spec: GroupSpec, noise_group: str = "id") -> Arrangement:
    """Materialize a static GroupSpec's tables as Arrangement arrays."""
    placements = {
        g.name: (list(range(g.mb_start, g.mb_end, 2))
                 if g.mb_start is not None else [])
        for g in spec.groups
    }
    return arrangement_from_placements(spec, placements, noise_group=noise_group)


def random_arrangement(
    spec: GroupSpec, rng: np.random.Generator, noise_group: str = "id"
) -> Arrangement:
    """Fresh random slot placement for this step, as arrays (host-side, cheap:
    ~len(groups) numpy ops). Contract: RandomMiniBatchUtils re-randomizing
    every iteration (mini_batch_random_multi_split_utils.py:45-68) —
    independent per-group draws; overlapping and non-covering placements
    included (see random_placements)."""
    return arrangement_from_placements(
        spec, random_placements(spec, rng), noise_group=noise_group
    )


def apply_arrangement_z(arr: Arrangement, z: jax.Array) -> jax.Array:
    """re_arrange_z with array tables — jittable, recompile-free.

    Note: the randomized mode has no style-mixing support (reference
    mini_batch_random_multi_split_utils.py:77-78), so this takes one z.
    """
    return jnp.where(arr.share_mask, z[arr.pair_src], z)


def apply_arrangement_noise(arr: Arrangement, noises: Sequence[jax.Array]) -> list[jax.Array]:
    """re_arrange_inject_noise with array tables ('same_for_same_id')."""
    return [n[arr.noise_pair_src] for n in noises]
