"""CLI shell tests (the reference app's argv contract: one scene file,
``src/main.cpp:341-351``, plus our extended flags)."""

import numpy as np
import pytest

from project3_cuda_path_tracer_2025_tpu import cli


def test_missing_scene_exits_nonzero(capsys):
    rc = cli.main(["/does/not/exist.json", "--cpu"])
    assert rc == 1
    assert "Couldn't read from" in capsys.readouterr().err


def test_parser_flags():
    p = cli.build_parser()
    a = p.parse_args(
        ["s.json", "--spp", "7", "--res", "32", "48", "--no-bvh",
         "--material-sort", "--integrator", "wavefront", "--raw-camera"]
    )
    assert a.spp == 7 and a.res == [32, 48]
    assert a.no_bvh and a.material_sort and a.raw_camera
    assert a.integrator == "wavefront"


def test_end_to_end_render(tmp_path, scenes_dir, capsys):
    rc = cli.main(
        [
            str(scenes_dir / "cornell.json"),
            "--cpu",
            "--res", "16", "16",
            "--spp", "2",
            "--out", str(tmp_path),
            "--quiet",
        ]
    )
    assert rc == 0
    pngs = list(tmp_path.glob("cornell.*samp.png"))
    assert len(pngs) == 1
    from project3_cuda_path_tracer_2025_tpu.utils import image_io

    img = image_io.read_png(str(pngs[0]))
    assert img.shape == (16, 16, 3)
    assert img.max() > 0
