"""Extraction throughput at the configs' real max_image_size=3200 regime.

Renders one 3200x2400 textured view, measures the TPU SIFT (batch-1 — the
batch_pixel_budget forces single-image dispatches at this size) against
OpenCV SIFT on the host, same 8024-feature budget.  Prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from monocularsfm_tpu.ops.sift import SIFT
    from monocularsfm_tpu.utils.synthetic import render_textured_images

    imgs, _, _, _ = render_textured_images(
        scene_seed=11, num_cameras=1, width=3200, height=2400)
    img = imgs[0]
    ex = SIFT()
    kp, _ = ex.extract(img)   # warm (compile)
    t0 = time.perf_counter()
    for _ in range(reps):
        kp, desc = ex.extract(img)
    dt_tpu = (time.perf_counter() - t0) / reps

    import cv2

    sift = cv2.SIFT_create(nfeatures=8024)
    sift.detectAndCompute(img, None)  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        cv_kp, cv_d = sift.detectAndCompute(img, None)
    dt_cv = (time.perf_counter() - t0) / reps

    print(json.dumps({
        "image": "3200x2400",
        "tpu_s_per_image": round(dt_tpu, 3),
        "tpu_images_per_sec": round(1 / dt_tpu, 3),
        "tpu_features": len(kp),
        "opencv_s_per_image": round(dt_cv, 3),
        "opencv_images_per_sec": round(1 / dt_cv, 3),
        "opencv_features": len(cv_kp),
        "vs_opencv": round(dt_cv / dt_tpu, 3),
    }))


if __name__ == "__main__":
    main()
