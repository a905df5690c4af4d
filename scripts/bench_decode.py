"""Measure native loader open+seek+decode cost for the bench clip."""
import sys
sys.path.insert(0, "/root/repo")
import os
import time

if len(sys.argv) > 1 and sys.argv[1] != "default":
    os.environ["OPENCV_FFMPEG_CAPTURE_OPTIONS"] = sys.argv[1]

from velocity_tpu.ingest.native_loader import NativeVideoStream

video = "/root/reference/data/IMG_4119.MOV"
for trial in range(3):
    t0 = time.time()
    with NativeVideoStream(video, start=41, count=20, step=1) as s:
        it = iter(s)
        g, _small, _t, _i = next(it)
        t_first = time.time() - t0
        for _ in it:
            pass
        t_all = time.time() - t0
    print(f"trial {trial}: first frame {t_first*1e3:.0f} ms, all 20 {t_all*1e3:.0f} ms")
