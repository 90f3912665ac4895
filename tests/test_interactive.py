"""Interactive live-edit session (the reference viewer's loop, headless):
edits flow through SceneManager, camera moves reset accumulation, renders
stay live across edits."""

import json

import numpy as np

from fypraytracer_tpu.scene.procedural import cornell_box


class _Capture:
    def __init__(self):
        self.lines = []

    def write(self, s):
        self.lines.append(s)

    def flush(self):
        pass

    def records(self):
        return [json.loads(x) for x in "".join(self.lines).splitlines() if x]


def test_interactive_session_edit_loop(tmp_path):
    from fypraytracer_tpu.app.interactive import InteractiveSession

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    out = _Capture()
    sess = InteractiveSession(builder, cam, out=out)
    png = tmp_path / "frame.png"
    sess.run([
        "tech cosine",
        "bounces 1",
        "step 2",
        "mat 0 albedo 0.9 0.1 0.1",     # repaint the white walls red
        "step 2",
        "move 0 1.2 2.4",               # camera move resets accumulation
        "step 1",
        "mesh 0 position 0 0.2 0",      # geometry edit -> full recompile
        "step 1",
        f"save {png}",
        "info",
        "quit",
    ])
    rec = out.records()
    steps = [r for r in rec if "frame_ms" in r]
    assert len(steps) == 4
    assert all(r["finite"] for r in steps)
    # the material repaint must change the image
    assert abs(steps[1]["mean"] - steps[0]["mean"]) > 1e-4
    # camera move resets accumulation (frame counter restarted)
    assert steps[2]["frames"] == 1
    assert png.exists()
    info = [r for r in rec if "triangles" in r][-1]
    assert info["scene_version"] == 2          # material edit + mesh edit
    assert abs(info["camera"][1] - 1.2) < 1e-6


def test_interactive_load_and_add_sphere(tmp_path):
    """REPL mesh add mid-session (the reference's runtime import flow,
    WalnutApp.cpp:742): `load`/`add-sphere` grow the scene and the next
    `step` renders through the rebuilt structures."""
    from fypraytracer_tpu.app.interactive import InteractiveSession

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    obj = tmp_path / "tri.obj"
    obj.write_text("v -0.5 0 0\nv 0.5 0 0\nv 0 0.8 0\nf 1 2 3\n")
    out = _Capture()
    sess = InteractiveSession(builder, cam, out=out)
    sess.run([
        "tech cosine",
        "bounces 1",
        "step 1",
        "info",
        "add-sphere 0 0.55 0 0 0",
        f"load {obj} 1 0 0 0.5",
        "step 1",
        "info",
        "quit",
    ])
    rec = out.records()
    infos = [r for r in rec if "scene_version" in r]
    steps = [r for r in rec if "frame_ms" in r]
    assert len(steps) == 2 and all(r["finite"] for r in steps)
    loaded = [r for r in rec if "loaded" in r]
    assert loaded and loaded[0]["triangles"] == 1
    assert infos[1]["scene_version"] == infos[0]["scene_version"] + 1
    # sphere (6x? default rows/cols -> 16*32*2 tris) + 1 obj tri added
    assert infos[1]["triangles"] > infos[0]["triangles"] + 1
    # the added geometry changes the image
    assert abs(steps[1]["mean"] - steps[0]["mean"]) > 1e-5


def test_interactive_session_bad_command_survives():
    from fypraytracer_tpu.app.interactive import InteractiveSession

    builder, cam = cornell_box(width=16, height=16, with_spheres=False)
    out = _Capture()
    sess = InteractiveSession(builder, cam, out=out)
    sess.run(["bogus 1 2", "mat 99 albedo 1 0 0", "info", "quit"])
    rec = out.records()
    assert sum("error" in r for r in rec) == 2
    assert any("triangles" in r for r in rec)


def test_interactive_texture_and_camera_knobs(tmp_path):
    """Round-5 parity last-mile (VERDICT r4 missing #2/#3): `texture` +
    `mat N map`, `fov`, `clip`, and the live `restir` knobs — each drives
    the same state the reference's panels edit (WalnutApp.cpp:548-560
    camera ctor params, :617-643 ReSTIR sliders, :674 Add-Texture)."""
    import numpy as onp

    from fypraytracer_tpu.app.interactive import InteractiveSession
    from fypraytracer_tpu.utils.image import save_png

    builder, cam = cornell_box(width=32, height=32, with_spheres=False)
    png = tmp_path / "green.png"
    tex = onp.zeros((8, 8, 3), onp.uint8)
    tex[..., 1] = 255
    save_png(str(png), tex)

    out = _Capture()
    sess = InteractiveSession(builder, cam, out=out)
    sess.run([
        "tech cosine",
        "bounces 1",
        "step 2",
        f"texture {png}",
        "mat 0 map 0",            # texture the white walls green
        "step 2",
        "fov 70",
        "step 1",
        "clip 0.05 50",
        "step 1",
        "tech restir-di",
        "restir candidates 2",
        "restir neighbors 2",
        "restir radius 8",
        "restir history 3",
        "restir temporal 0",
        "restir spatial 0",
        "sky 0.1 0.2 0.3",
        "accumulate 1",
        "step 1",
        "info",
        "quit",
    ])
    rec = out.records()
    assert not any("error" in r for r in rec), rec
    steps = [r for r in rec if "frame_ms" in r]
    assert len(steps) == 5 and all(r["finite"] for r in steps)
    # the mid-session texture changed the image
    assert abs(steps[1]["mean"] - steps[0]["mean"]) > 1e-4
    # fov change restarted accumulation and changed framing
    assert steps[2]["frames"] == 1
    assert abs(steps[2]["mean"] - steps[1]["mean"]) > 1e-5
    tex_rec = [r for r in rec if "texture_id" in r]
    assert tex_rec and tex_rec[0]["texture_id"] == 0
    # restir knobs took effect in settings
    assert sess.settings.light_candidates == 2
    assert sess.settings.spatial_neighbors == 2
    assert sess.settings.spatial_radius == 8
    assert sess.settings.temporal_history_limit == 3
    assert sess.settings.temporal_reuse is False
    assert sess.settings.spatial_reuse is False
    assert sess.settings.sky_color == (0.1, 0.2, 0.3)
    assert sess.camera.vfov_deg == 70.0 and sess.camera.far == 50.0
