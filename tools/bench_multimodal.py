"""Multimodal codec throughput: pure-Python JPEG/MJPEG on the actor pool.

Measures the REAL codecs end-to-end as Ray stages (synth → decode), the
configuration q_image/q_video_pipeline run: JPEG stills through
ImageDecodeStage and AVI-MJPEG through VideoFrameSampleStage. Prints one
JSON line (images/s, frames/s) — the honest cost of codec work without
codec libraries; at 100 TB this stage is embarrassingly parallel and
scales with actors.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def main() -> dict:
    import logging

    import pyarrow as pa
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    import ray.data as rd
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from nmr_fair_dos_ray.stages.multimodal import (
        ImageDecodeStage, VideoFrameSampleStage, synth_mjpeg_avi,
    )
    from nmr_fair_dos_ray.stages.jpeg import encode_jpeg

    import numpy as np

    out: dict = {"metric": "multimodal_codecs", "num_cpus": NUM_CPUS}

    # JPEG stills: encode once on the driver (encoder is part of the repo
    # but decode is the serving-path cost), decode on the pool
    rng = np.random.RandomState(5)
    yy, xx = np.mgrid[0:48, 0:64]
    n_imgs = 512
    payloads = []
    for i in range(n_imgs):
        img = ((yy * 3 + xx * 2 + i) % 256).astype(np.uint8)
        payloads.append(encode_jpeg(np.stack([img, img, 255 - img], axis=-1)))
    t = pa.table({
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array([64] * n_imgs, pa.int32()),
        "height": pa.array([48] * n_imgs, pa.int32()),
        "channels": pa.array([3] * n_imgs, pa.int32()),
        "format": pa.array(["jpeg"] * n_imgs, pa.string()),
    })
    ds = rd.from_arrow(t)
    t0 = time.time()
    res = ds.map_batches(
        ImageDecodeStage, batch_size=16, batch_format="pyarrow",
        concurrency=(2, NUM_CPUS),
    ).to_pandas()
    wall = time.time() - t0
    assert bool(res["decoded"].all())
    out["jpeg_decode"] = {
        "n_images": n_imgs, "wall_sec": round(wall, 2),
        "images_per_sec": round(n_imgs / wall, 1),
    }

    # AVI-MJPEG: every-2nd-frame sampling over 256 six-frame clips
    n_vids = 256
    vt = pa.table({
        "doc_id": pa.array(range(n_vids), pa.int64()),
        "payload": pa.array(
            [synth_mjpeg_avi(i, w=32, h=24) for i in range(n_vids)],
            pa.binary(),
        ),
    })
    t0 = time.time()
    vres = rd.from_arrow(vt).map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs={"every_nth": 2, "max_frames": 3},
        batch_size=8, batch_format="pyarrow", concurrency=(2, NUM_CPUS),
    ).to_pandas()
    wall = time.time() - t0
    assert bool(vres["decoded"].all())
    frames = int(vres["n_frames"].sum())
    out["mjpeg_sample"] = {
        "n_videos": n_vids, "frames_decoded": frames,
        "wall_sec": round(wall, 2),
        "frames_per_sec": round(frames / wall, 1),
    }
    ray.shutdown()
    return out


if __name__ == "__main__":
    print(json.dumps(main()))
