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

    def add_mesh(self, positions, tri_v, normals=None, uvs=None,
                 material: int = 0, position=(0.0, 0.0, 0.0),
                 rotation=(0.0, 0.0, 0.0), scale=(1.0, 1.0, 1.0)) -> int:
        """Add a mesh mid-session (Scene::CreateNewMeshInScene,
        Scene.cpp:241-290): append to the builder and queue a structure
        rebuild — the next ``apply()`` re-bakes transforms and rebuilds
        the BLAS/light tree/TLAS over the grown scene, exactly the
        reference's post-import rebuild sequence (Scene.cpp:252-289).
        Returns the new mesh id."""
        mesh_id = self.builder.add_mesh(
            positions, tri_v, normals=normals, uvs=uvs, material=material,
            position=position, rotation=rotation, scale=scale)
        self._meshes_dirty.add(mesh_id)
        return mesh_id

    def load_mesh(self, path: str, material: int = 0,
                  position=(0.0, 0.0, 0.0), rotation=(0.0, 0.0, 0.0),
                  scale=(1.0, 1.0, 1.0)) -> int:
        """Import an OBJ mid-session (the reference's file-dialog import,
        WalnutApp.cpp:742 → Scene::CreateNewMeshInScene).  Honors the
        loader's left-handed z-flip convention (Mesh.cpp:299-304)."""
        from fypraytracer_tpu.scene.objloader import load_obj

        pos, tri, nrm, uv = load_obj(path)
        return self.add_mesh(pos, tri, normals=nrm, uvs=uv,
                             material=material, position=position,
                             rotation=rotation, scale=scale)

    @property
    def dirty(self) -> bool:
        return bool(self._meshes_dirty or self._materials_dirty)

    # -- flush (PerformAllSceneUpdates, SceneManager.cpp:6-130) --------------

    def apply(self, renderer=None) -> Scene:
        """Recompile if dirty; optionally reset the renderer's accumulation
        and swap its scene in place (device re-upload happens lazily via
        Renderer's device_put)."""
        if self.dirty:
            if not self._meshes_dirty:
                # material-only edit: geometry, per-tri AABBs and the BVH
                # are untouched — rebuild just the material table + the
                # emission-dependent structures (emissive list, light
                # tree), the incremental counterpart of the reference's
                # materialsToUpdate flush (SceneManager.cpp:87-130)
                self.scene = self._apply_material_edit()
            else:
                # mesh transforms moved geometry: full recompile.  With
                # the native builders the structure rebuild is cheap; the
                # reference's per-BLAS selectiveness (SceneManager.cpp:
                # 33-85) matters on its scalar CPU path, not here.
                self.scene = self.builder.compile(leaf_size=self.leaf_size,
                                                  native=self.native)
            self.version += 1
            self._meshes_dirty.clear()
            self._materials_dirty.clear()
            if renderer is not None:
                renderer.scene = self.scene.device_put()
                renderer.reset()
        return self.scene

    def _apply_material_edit(self) -> Scene:
        import dataclasses

        import numpy as np

        from fypraytracer_tpu.scene.build import empty_light_tree
        from fypraytracer_tpu.scene.types import MaterialTable

        m = self.builder._mat
        materials = MaterialTable(
            albedo=np.asarray(m["albedo"], np.float32).reshape(-1, 3),
            roughness=np.asarray(m["roughness"], np.float32),
            metallic=np.asarray(m["metallic"], np.float32),
            emission_color=np.asarray(m["emission_color"],
                                      np.float32).reshape(-1, 3),
            emission_power=np.asarray(m["emission_power"], np.float32),
            albedo_map=np.asarray(m["albedo_map"], np.int32),
        )
        g = self.scene.geometry
        positions = np.asarray(g.positions)
        tri_v = np.asarray(g.tri_v)
        tri_mat = np.asarray(g.tri_mat)
        emission = materials.emission_color * materials.emission_power[:, None]
        emissive_mat = np.abs(emission).sum(axis=-1) > 0.0
        emissive_tris = np.nonzero(emissive_mat[tri_mat])[0].astype(np.int32)
        mesh_ranges = [(me.tri_start, me.tri_start + len(me.tri_v))
                       for me in self.builder.meshes]
        lt = None
        if len(emissive_tris) > 0:
            if self.native:
                from fypraytracer_tpu.accel import native as native_mod
                lt = native_mod.build_light_tree_native(
                    positions, tri_v, tri_mat,
                    np.asarray(emission, np.float32), mesh_ranges)
            if lt is None:
                from fypraytracer_tpu.accel import lighttree as lt_mod
                lt = lt_mod.build_scene_light_tree(
                    positions, tri_v, tri_mat,
                    np.asarray(emission, np.float32), mesh_ranges)
        if lt is None:
            lt = empty_light_tree(len(tri_v))
        return dataclasses.replace(self.scene, materials=materials,
                                   emissive_tris=emissive_tris,
                                   light_tree=lt)
