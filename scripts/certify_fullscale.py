"""Full-scale BASELINE image certification (VERDICT r5 item 5).

Renders the reference's bundled 8-sphere world at the BASELINE target
config (512x512, 64 spp, 8 bounces) through BOTH independent
implementations:

  * the native C++ parity engine (bit-identical to the NumPy oracle and
    hence to the reference algorithm: exact xorshift32 stream in raster
    order, same f32 op order — tests/test_native.py), and
  * the TPU fast engine (counter-based pcg3d sampler, Pallas megakernel)
    with the reference's plane-sign parity semantics;

and certifies their agreement in u8 output space (per-channel max diff,
mean abs diff, PSNR — the samplers differ, so the comparison is
statistical: Monte-Carlo noise of two unbiased 64-sample estimators).
Writes CERTIFY.json with the native image's sha256 so the artifact is
reproducible, plus the PNGs for eyeballing.
"""
import hashlib
import json
import sys
from pathlib import Path
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np

import raytracer_tpu as rt
from raytracer_tpu import native

W, H, SPP, DEPTH = 512, 512, 64, 8


def main():
    src = rt.models.default_world_source()
    nw = native.NativeWorld(src)
    print("native parity render ...", flush=True)
    nat = nw.render(W, H, samples_per_pixel=SPP, max_ray_bounces=DEPTH,
                    parity=True, num_threads=2)       # [H, W, 4] u8
    nat_rgb = np.asarray(nat)[..., :3].astype(np.int32)

    print("tpu fast render ...", flush=True)
    world = rt.parse_input(src)
    scene, cam = world.to_scene(), world.to_camera()
    tpu_img, segs = rt.ray_trace(
        scene, cam, W, H,
        rt.Options(samples_per_pixel=SPP, max_ray_bounces=DEPTH,
                   parity_plane_sign=True))
    tpu_rgb = np.asarray(tpu_img)[..., :3].astype(np.int32)

    diff = np.abs(nat_rgb - tpu_rgb)
    mse = float(np.mean((nat_rgb - tpu_rgb).astype(np.float64) ** 2))
    psnr = 10.0 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    report = {
        "config": {"width": W, "height": H, "spp": SPP, "depth": DEPTH,
                   "scene": "default_world (reference world.txt)"},
        "native_parity_sha256": hashlib.sha256(
            np.ascontiguousarray(nat).tobytes()).hexdigest(),
        "native_engine": "C++ parity (bit-identical to oracle/reference "
                         "algorithm, exact xorshift32 stream)",
        "tpu_engine": "pallas megakernel, pcg3d counter sampler, "
                      "parity plane sign",
        "per_channel_max_diff_u8": [int(diff[..., c].max())
                                    for c in range(3)],
        "mean_abs_diff_u8": float(diff.mean()),
        "frac_pixels_diff_gt_8": float((diff.max(axis=-1) > 8).mean()),
        "psnr_db": round(psnr, 2),
        "tpu_segments": int(segs),
    }
    (Path(__file__).resolve().parent.parent / "CERTIFY.json").write_text(
        json.dumps(report, indent=1) + "\n")
    print(json.dumps(report, indent=1))
    rt.image.write_png(np.asarray(nat), "certify_native.png")
    rt.image.write_png(np.asarray(tpu_img), "certify_tpu.png")
    # acceptance: two unbiased 64-spp estimators of the same integral -
    # agreement must be sampling noise, not bias
    assert psnr > 30.0, f"PSNR {psnr} too low - engines disagree"
    assert report["mean_abs_diff_u8"] < 4.0
    print("CERTIFIED")


if __name__ == "__main__":
    main()
