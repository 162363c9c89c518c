"""VolumetricModel facade: a scene representation + a named render procedure + config.

Parity: reference thre3d_atom/modules/volumetric_model.py:30-197, with TPU-native
replacements:
  * no ``device`` field — placement is handled by jax.sharding / the default device
  * per-call config overrides build a new frozen config (hashable jit static) instead of
    the reference's deepcopy+setattr (volumetric_model.py:66-81)
  * full-image renders chunk rays with ``jax.lax.map`` over statically shaped chunks
    inside ONE jit instead of a Python chunk loop (volumetric_model.py:150-167)
  * checkpoints are .npz arrays + JSON config; the render procedure is stored by registry
    NAME — never a pickled function (cf. volumetric_model.py:92, a pickle of the fn)
"""
from __future__ import annotations

import dataclasses
import json
from functools import partial
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.models.voxels import (
    VoxelGrid,
    create_voxel_grid_from_saved_info_dict,
)
from thr3ed_atom_tpu.rendering.interface import Rays, RenderOut
from thr3ed_atom_tpu.rendering.rays import (
    cast_rays,
    flatten_rays,
    reshape_rendered_output,
)
from thr3ed_atom_tpu.rendering.renderer import (
    RENDER_PROCEDURES,
    SHVoxGridRenderConfig,
)
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, CameraPose
from thr3ed_atom_tpu.utils.constants import (
    CONFIG_DICT,
    EXTRA_INFO,
    RENDER_CONFIG,
    RENDER_PROCEDURE,
    STATE_DICT,
    THRE3D_REPR,
)


class VolumetricModel:
    """Facade owning (thre3d_repr pytree, render procedure name, render config)."""

    def __init__(
        self,
        thre3d_repr: VoxelGrid,
        render_procedure: str = "render_sh_voxel_grid",
        render_config: Optional[SHVoxGridRenderConfig] = None,
    ) -> None:
        assert render_procedure in RENDER_PROCEDURES, (
            f"unknown render procedure '{render_procedure}'; "
            f"known: {sorted(RENDER_PROCEDURES)}"
        )
        self._thre3d_repr = thre3d_repr
        self._render_procedure_name = render_procedure
        self._render_config = render_config

    # ------------------------------------------------------------------ properties

    @property
    def thre3d_repr(self) -> VoxelGrid:
        return self._thre3d_repr

    @thre3d_repr.setter
    def thre3d_repr(self, value: VoxelGrid) -> None:
        self._thre3d_repr = value

    @property
    def render_procedure(self):
        return RENDER_PROCEDURES[self._render_procedure_name]

    @property
    def render_procedure_name(self) -> str:
        return self._render_procedure_name

    @property
    def render_config(self) -> SHVoxGridRenderConfig:
        return self._render_config

    # ------------------------------------------------------------------ rendering

    def render_rays(
        self, rays: Rays, key: Optional[jax.Array] = None, **config_overrides
    ) -> RenderOut:
        """Differentiable ray render with optional per-call config overrides."""
        config = (
            self._render_config.replace(**config_overrides)
            if config_overrides
            else self._render_config
        )
        return _jit_render_rays(
            self._render_procedure_name, self._thre3d_repr, rays, config, key
        )

    def render(
        self,
        camera_pose: CameraPose,
        camera_intrinsics: CameraIntrinsics,
        parallel_rays_chunk_size: Optional[int] = None,
        key: Optional[jax.Array] = None,
        verbose: bool = False,
        **config_overrides,
    ) -> RenderOut:
        """Full-image render: cast -> flatten -> lax.map over ray chunks -> [H, W, .].

        Deterministic by default (no perturbation/noise) like the reference's no_grad
        render path; pass a key + overrides to change that.
        """
        overrides = dict(config_overrides)
        overrides.setdefault("perturb_sampled_points", False)
        config = self._render_config.replace(**overrides)

        # pose-structured procedures (the bricked slab-march kernel) render the whole
        # image in one launch instead of looping flat ray chunks
        image_fn = getattr(self.render_procedure, "render_image", None)
        if image_fn is not None:
            if not hasattr(self, "_image_render_cache"):
                self._image_render_cache = {}
            return image_fn(
                self._thre3d_repr,
                camera_pose,
                camera_intrinsics,
                config,
                key=key,
                cache=self._image_render_cache,
            )

        chunk_size = (
            parallel_rays_chunk_size
            if parallel_rays_chunk_size is not None
            else config.parallel_rays_chunk_size
        )

        flat_rays = flatten_rays(cast_rays(camera_intrinsics, camera_pose))
        num_rays = len(flat_rays)
        chunk_size = min(chunk_size, num_rays)

        # per-frame precomputation (e.g. cell-packed tables), built once per GRID (not
        # per pose — cached until the underlying arrays change) and passed into every
        # chunk call
        prepared = self._get_prepared(config)

        # a Python loop of small identically-shaped jit calls: each chunk program is
        # tiny and compiles quickly/reliably (one compile total — shapes repeat), at
        # ~ms dispatch cost per chunk
        num_chunks = -(-num_rays // chunk_size)
        padded = num_chunks * chunk_size
        chunk_keys = (
            jax.random.split(key, num_chunks) if key is not None else [None] * num_chunks
        )
        chunk_range = range(num_chunks)
        if verbose:
            from tqdm import tqdm

            chunk_range = tqdm(chunk_range, desc="render chunks")

        chunks = []
        for c in chunk_range:
            start = c * chunk_size
            stop = min(start + chunk_size, num_rays)
            chunk_rays = Rays(
                origins=flat_rays.origins[start:stop],
                directions=flat_rays.directions[start:stop],
            )
            if stop - start < chunk_size:  # pad the tail chunk to the static shape
                pad_n = chunk_size - (stop - start)
                chunk_rays = Rays(
                    origins=jnp.concatenate(
                        [chunk_rays.origins, jnp.zeros((pad_n, 3))], axis=0
                    ),
                    directions=jnp.concatenate(
                        [
                            chunk_rays.directions,
                            jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (pad_n, 1)),
                        ],
                        axis=0,
                    ),
                )
            out = _jit_render_chunk(
                self._render_procedure_name,
                self._thre3d_repr,
                chunk_rays,
                config,
                chunk_keys[c],
                prepared,
            )
            if stop - start < chunk_size:
                out = jax.tree_util.tree_map(lambda x: x[: stop - start], out)
            chunks.append(out)

        rendered = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs, axis=0), *chunks
        )
        return reshape_rendered_output(rendered, camera_intrinsics)

    def render_poses(
        self,
        camera_poses,
        camera_intrinsics: CameraIntrinsics,
        key: Optional[jax.Array] = None,
        **config_overrides,
    ) -> RenderOut:
        """Render a sequence of poses with a leading pose axis on every output.

        Pose-structured procedures (gnomonic) render each march-axis variant's
        poses in ONE batched dispatch (rendering/gnomonic.py
        render_poses_gnomonic) — the TPU-idiomatic form of the reference's
        per-pose loop (animations.py:17-64); other procedures fall back to a
        per-pose render loop with identical outputs."""
        overrides = dict(config_overrides)
        overrides.setdefault("perturb_sampled_points", False)
        config = self._render_config.replace(**overrides)
        poses_fn = getattr(self.render_procedure, "render_poses", None)
        if poses_fn is not None:
            if not hasattr(self, "_image_render_cache"):
                self._image_render_cache = {}
            return poses_fn(
                self._thre3d_repr,
                camera_poses,
                camera_intrinsics,
                config,
                key=key,
                cache=self._image_render_cache,
            )
        outs = [
            self.render(pose, camera_intrinsics, key=key, **config_overrides)
            for pose in camera_poses
        ]
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *outs)

    def _get_prepared(self, config):
        """Cache the render procedure's per-grid precomputation (e.g. packed tables)
        across render calls; invalidated when the grid's arrays or the config change."""
        if getattr(self.render_procedure, "prepare", None) is None:
            return None
        grid = self._thre3d_repr
        # packing depends only on the table dtype/layout choices, not on per-call
        # render modes
        cache_key = (
            getattr(config, "fast_bf16_features", None),
            getattr(config, "fast_pack_features", None),
        )
        cache = getattr(self, "_prepared_cache", None)
        if (
            cache is not None
            and cache[0] is grid.densities
            and cache[1] is grid.features
            and cache[2] == cache_key
        ):
            return cache[3]
        prepared = _jit_prepare(self._render_procedure_name, grid, config)
        self._prepared_cache = (grid.densities, grid.features, cache_key, prepared)
        return prepared

    def drop_prepared_cache(self) -> None:
        """Free the per-grid prepared tables (packed bf16 slices, occupancy).

        At 256^3 the prepared tables are ~2.7 GB of HBM; a training loop that
        renders feedback/test images mid-stage must release them afterwards or
        the NEXT train step's peak no longer fits (the canonical 4-stage run
        OOM'd on the first post-feedback step of stage 4 with the cache
        resident). Re-preparing on the next render call is one jitted pack,
        negligible next to a full-image render."""
        if hasattr(self, "_prepared_cache"):
            del self._prepared_cache

    # ------------------------------------------------------------------ io

    def get_save_info(
        self, extra_info: Optional[Dict[str, Any]] = None
    ) -> Dict[str, Any]:
        info = {
            THRE3D_REPR: {
                STATE_DICT: {
                    "densities": np.asarray(self._thre3d_repr.densities),
                    "features": np.asarray(self._thre3d_repr.features),
                },
                CONFIG_DICT: self._thre3d_repr.get_save_config_dict(),
            },
            RENDER_PROCEDURE: self._render_procedure_name,
            RENDER_CONFIG: _render_config_to_jsonable(self._render_config),
        }
        if extra_info is not None:
            info[EXTRA_INFO] = extra_info
        return info

    def save(self, path: Path, extra_info: Optional[Dict[str, Any]] = None) -> None:
        save_model(self, path, extra_info)


# ---------------------------------------------------------------------- jit helpers

# NOTE: procedure name + config are static; the grid and rays are traced pytrees. The
# jit cache therefore holds one entry per (procedure, config, shapes) combination.


def _procedure(name: str):
    return RENDER_PROCEDURES[name]


@partial(jax.jit, static_argnums=(0, 3))
def _jit_render_rays(name, thre3d_repr, rays, config, key):
    return _procedure(name)(thre3d_repr, rays, config, key)


@partial(jax.jit, static_argnums=(0, 2))
def _jit_prepare(name, thre3d_repr, config):
    return _procedure(name).prepare(thre3d_repr, config)


@partial(jax.jit, static_argnums=(0, 3))
def _jit_render_chunk(name, thre3d_repr, chunk_rays, config, key, prepared):
    procedure = _procedure(name)
    if prepared is not None:
        return procedure(thre3d_repr, chunk_rays, config, key, prepared=prepared)
    return procedure(thre3d_repr, chunk_rays, config, key)


# ---------------------------------------------------------------------- checkpoint io


def _render_config_to_jsonable(config: SHVoxGridRenderConfig) -> Dict[str, Any]:
    d = dataclasses.asdict(config)
    d["camera_bounds"] = [config.camera_bounds.near, config.camera_bounds.far]
    return d


def _render_config_from_jsonable(d: Dict[str, Any]) -> SHVoxGridRenderConfig:
    d = dict(d)
    d["camera_bounds"] = CameraBounds(*[float(v) for v in d["camera_bounds"]])
    return SHVoxGridRenderConfig(**d)


def save_model(
    vol_mod: VolumetricModel, path: Path, extra_info: Optional[Dict[str, Any]] = None
) -> None:
    """Write <path>.npz (arrays) + <path>.json (config). No pickles anywhere."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    info = vol_mod.get_save_info(extra_info)
    arrays = info[THRE3D_REPR][STATE_DICT]
    np.savez(str(path.with_suffix(".npz")), **arrays)
    meta = {
        THRE3D_REPR: {CONFIG_DICT: info[THRE3D_REPR][CONFIG_DICT]},
        RENDER_PROCEDURE: info[RENDER_PROCEDURE],
        RENDER_CONFIG: info[RENDER_CONFIG],
        EXTRA_INFO: _jsonable(info.get(EXTRA_INFO, {})),
    }
    with open(path.with_suffix(".json"), "w") as f:
        json.dump(meta, f, indent=2)


def _jsonable(obj):
    if isinstance(obj, dict):
        return {k: _jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonable(v) for v in obj]
    if isinstance(obj, (np.ndarray, jnp.ndarray)):
        return np.asarray(obj).tolist()
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def create_volumetric_model_from_saved_model(
    model_path: Path,
) -> Tuple[VolumetricModel, Dict[str, Any]]:
    """Rebuild a VolumetricModel from <path>.npz + <path>.json
    (counterpart of reference volumetric_model.py:177-197)."""
    model_path = Path(model_path)
    with open(model_path.with_suffix(".json")) as f:
        meta = json.load(f)
    arrays = np.load(str(model_path.with_suffix(".npz")))
    saved_info = {
        THRE3D_REPR: {
            STATE_DICT: {k: arrays[k] for k in arrays.files},
            CONFIG_DICT: meta[THRE3D_REPR][CONFIG_DICT],
        }
    }
    thre3d_repr = create_voxel_grid_from_saved_info_dict(saved_info)
    render_config = _render_config_from_jsonable(meta[RENDER_CONFIG])
    vol_mod = VolumetricModel(
        thre3d_repr=thre3d_repr,
        render_procedure=meta[RENDER_PROCEDURE],
        render_config=render_config,
    )
    return vol_mod, meta.get(EXTRA_INFO, {})
