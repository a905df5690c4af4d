"""Camera database, annotations, EXIF, and ingest tests against the real dataset."""

import math
from pathlib import Path

import numpy as np
import pytest

from velocity_tpu.camera import camera_info, load_annotation
from velocity_tpu.camera.annotations import Annotation, save_annotation, find_annotation
from velocity_tpu.camera.exif import read_exif, exif_to_llat, exif_image_size
from velocity_tpu.ingest import open_video, StillsReader

REF = Path("/root/reference")
HAVE_DATA = (REF / "data" / "IMG_4134.MOV").exists()
needs_data = pytest.mark.skipif(not HAVE_DATA, reason="reference dataset not mounted")


class TestCameraDatabase:
    def test_video_focal_diagonal_rule(self):
        info = camera_info("x/IMG_4134.MOV", "iPhone 6s", width=1920, height=1080)
        want = 3486 * math.hypot(4032, 3024) / math.hypot(3840, 2160)
        np.testing.assert_allclose(info.focal_pix, want)
        assert info.is_video

    def test_stills_focal(self):
        info = camera_info("x/IMG_4122.JPG", "iPhone 6s", width=4032, height=3024)
        np.testing.assert_allclose(info.focal_pix, 3486.0)
        assert not info.is_video
        assert info.klt_block == (21, 21)

    def test_principal_point_half_pixel(self):
        info = camera_info("v.MOV", width=1920, height=1080)
        np.testing.assert_allclose(info.principal_point, [960.5, 540.5])

    def test_intrinsic_matrix_rowvec_layout(self):
        info = camera_info("v.MOV", width=1920, height=1080)
        K = info.intrinsic_matrix_rowvec
        assert K.shape == (3, 3)
        assert K[0, 1] == 0 and K[0, 2] == 0 and K[2, 2] == 1
        assert K[2, 0] == 960.5 and K[2, 1] == 540.5

    def test_half_scale_rule(self):
        """4K->2K: focal and q halve, principal point untouched."""
        info = camera_info("v.MOV", width=1920, height=1080)
        intr = info.intrinsics(scale=0.5)
        np.testing.assert_allclose(float(intr.fx), info.focal_pix[0] / 2, rtol=1e-6)
        np.testing.assert_allclose(float(intr.cx), 960.5)

    def test_unknown_platform_raises(self):
        with pytest.raises(ValueError, match="unknown camera platform"):
            camera_info("v.MOV", platform="iPhone x")

    def test_fov(self):
        spec = camera_info("v.MOV", width=1920, height=1080).spec
        fw, fh = spec.fov_deg
        assert 55 < fw < 65 and 45 < fh < 50  # iPhone 6s ~60x47 deg


@needs_data
class TestAnnotations:
    def test_load_mat_4134(self):
        ann = load_annotation(REF / "matlab" / "IMG_4134.MOV.mat")
        assert ann.q.shape == (4, 2)
        assert ann.q.dtype == np.float32
        # startFrame 19 (1-indexed) -> 18; the reference driver uses 19 for 4134
        assert ann.start_frame == 18
        np.testing.assert_allclose(ann.q[0], [3761.4, 1503.0], atol=0.1)

    def test_load_mat_4119(self):
        ann = load_annotation(REF / "matlab" / "IMG_4119.MOV.mat")
        assert ann.start_frame == 41  # 42 - 1

    def test_npz_roundtrip(self, tmp_path):
        ann = Annotation(
            q=np.arange(8, dtype=np.float32).reshape(4, 2), fname="X.MOV", start_frame=7
        )
        save_annotation(tmp_path / "X.MOV.npz", ann)
        ann2 = load_annotation(tmp_path / "X.MOV.npz")
        np.testing.assert_array_equal(ann2.q, ann.q)
        assert ann2.start_frame == 7

    def test_find_annotation(self, tmp_path):
        p = find_annotation("data/IMG_4134.MOV", [REF / "matlab", tmp_path])
        assert p.name == "IMG_4134.MOV.mat"
        with pytest.raises(FileNotFoundError):
            find_annotation("nope.MOV", [tmp_path])


@needs_data
class TestExif:
    def test_stills_exif(self):
        exif = read_exif(REF / "data" / "IMG_4122.JPG")
        w, h = exif_image_size(exif)
        assert (w, h) == (4032.0, 3024.0)
        llat = exif_to_llat(exif)
        # the dataset was shot near Valparaiso, Chile (2018-03-11)
        assert -33.5 < llat[0] < -32.5, llat
        assert -72.0 < llat[1] < -71.0, llat
        assert 0 < llat[2] < 300, llat
        assert 0 <= llat[3] < 86400


@needs_data
class TestVideoIngest:
    def test_probe_and_read(self):
        with open_video(REF / "data" / "IMG_4134.MOV") as vr:
            assert vr.info.width == 1920 and vr.info.height == 1080
            assert abs(vr.info.fps - 29.97) < 0.01
            fr = vr.read()
            assert fr is not None
            assert fr.gray.shape == (1080, 1920) and fr.gray.dtype == np.uint8
            assert fr.time_s == 0.0 and fr.index == 0

    def test_seek_matches_reference_semantics(self):
        """Timestamps are probed before read; seek lands on the exact frame."""
        with open_video(REF / "data" / "IMG_4134.MOV") as vr:
            frames = list(vr.frames(start=19, count=3))
        assert [f.index for f in frames] == [19, 20, 21]
        dt = frames[1].time_s - frames[0].time_s
        assert abs(dt - 1 / 29.97) < 1e-3

    def test_prefetch_equals_sync(self):
        with open_video(REF / "data" / "IMG_4134.MOV") as vr:
            sync = [f.gray.sum() for f in vr.frames(start=19, count=4)]
        with open_video(REF / "data" / "IMG_4134.MOV") as vr:
            pre = [f.gray.sum() for f in vr.prefetch(start=19, count=4)]
        assert sync == pre


@needs_data
class TestStillsIngest:
    def test_stills_reader(self):
        paths = [REF / "data" / f"IMG_{i}.JPG" for i in (4122, 4123)]
        sr = StillsReader(paths)
        assert sr.info.width == 4032
        out = list(sr.frames())
        assert len(out) == 2
        i, gray, llat = out[0]
        assert gray.shape == (3024, 4032)
        assert llat is not None and -33.5 < llat[0] < -32.5


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
