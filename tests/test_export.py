"""Viewer-of-record: OBJ frame export."""

from avbd3d_tpu import load_scene
from avbd3d_tpu.utils.export import export_obj


def test_export_obj_writes_boxes(tmp_path):
    scene = load_scene("Stack")
    path = str(tmp_path / "frame.obj")
    export_obj(path, scene.world, scene.n_real)
    text = open(path).read()
    assert text.count("o body_") == 11          # ground + 10 cubes
    assert text.count("\nv ") == 11 * 8
    assert text.count("\nf ") == 11 * 6
    # Ground slab corner reaches +-50 in x.
    assert "v 50.000000" in text
