"""Emit HALO_STUDY_r{N}.json — halo-size vs accuracy for tile-sharded SGM
at the production working resolution (540x768x64), on the 8-virtual-device
CPU mesh.

Truncated-halo tile sharding approximates SGM's vertical paths by cutting
their history at the exchanged rows; the recurrence forgets its carry
geometrically, so the question is how many rows buy how many correct
pixels. This measures, per halo, the agreement of the sharded disparity
with the UNSHARDED oracle, plus the exact relay mode (tile_mode='exact'),
which must match bit-for-bit at any tile count.

Usage: python scripts/make_halo_study.py [--out HALO_STUDY_r02.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

H, W, D = 540, 768, 64
N_TILE = 4  # 540 rows shard into 4 tiles of 135 (8 does not divide 540)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="HALO_STUDY_r04.json")
    # 200 and 405 exceed the 135-row block: multi-hop ring relay
    # (parallel/halo.py); 405 = (n_tile-1)*block = full coverage, which is
    # GUARANTEED bit-exact (every shard sees the whole image)
    ap.add_argument("--halos", type=int, nargs="*",
                    default=[8, 16, 32, 64, 200, 405])
    args = ap.parse_args()

    from stereovisionarray_tpu.config import CostConfig, SGMConfig
    from stereovisionarray_tpu.models.two_view import two_view_disparity
    from stereovisionarray_tpu.parallel import make_mesh, sharded_two_view_disparity

    # float32 XLA path on both sides: the sharded xla backend coerces int16
    # to f32, so the oracle must match its numerics exactly
    cost_cfg = CostConfig(num_disparities=D, census_window=(7, 9), dtype="float32")
    sgm_cfg = SGMConfig(num_paths=8, adaptive_p2=True, lr_max_diff=1.25)

    rng = np.random.default_rng(0)
    base = rng.uniform(0.0, 255.0, size=(H, W + 32)).astype(np.float32)
    left = jnp.asarray(base[:, :W])
    right = jnp.asarray(base[:, 32:])

    ref = two_view_disparity(left, right, cost_cfg, sgm_cfg, backend="xla")
    ref_d = np.asarray(ref.disparity)
    ref_v = np.asarray(ref.valid)

    mesh = make_mesh(1, N_TILE, 1)
    lb = left[None]
    rb = right[None]

    def compare(out):
        d = np.asarray(out.disparity)[0]
        v = np.asarray(out.valid)[0]
        both = ref_v & v
        diff = np.abs(d - ref_d)[both]
        return {
            "valid_agree": round(float((v == ref_v).mean()), 6),
            "within_half_px": round(float((diff <= 0.5).mean()), 6),
            "within_2px": round(float((diff <= 2.0).mean()), 6),
            "max_abs_diff": round(float(diff.max()) if diff.size else 0.0, 4),
            "bit_identical": bool((d == ref_d).all() and (v == ref_v).all()),
        }

    results = {}
    for halo in args.halos:
        out = sharded_two_view_disparity(
            lb, rb, mesh, cost_cfg, sgm_cfg, halo=halo, backend="xla",
            tile_mode="halo",
        )
        results[f"halo_{halo}"] = compare(out)
        print(f"halo={halo}: {results[f'halo_{halo}']}")

    out = sharded_two_view_disparity(
        lb, rb, mesh, cost_cfg, sgm_cfg, backend="xla", tile_mode="exact"
    )
    results["exact_relay"] = compare(out)
    print(f"exact: {results['exact_relay']}")

    # exact relay on the PRODUCTION integer Pallas kernels (r3): the seeded
    # stacked sweeps must be bit-identical to the SINGLE-CHIP Pallas
    # pipeline (its own oracle — the int16 path quantizes, so the float-XLA
    # oracle above is the wrong yardstick here)
    from stereovisionarray_tpu.config import CostConfig as _CC

    cc16 = _CC(num_disparities=D, census_window=(7, 9), dtype="int16")
    ref_p = two_view_disparity(left, right, cc16, sgm_cfg,
                               backend="pallas_interpret")
    out_p = sharded_two_view_disparity(
        lb, rb, mesh, cc16, sgm_cfg, backend="pallas_interpret",
        tile_mode="exact",
    )
    dp, vp = np.asarray(out_p.disparity)[0], np.asarray(out_p.valid)[0]
    results["exact_relay_pallas_int16"] = {
        "bit_identical_vs_single_chip_pallas": bool(
            (dp == np.asarray(ref_p.disparity)).all()
            and (vp == np.asarray(ref_p.valid)).all()
        ),
    }
    print(f"exact pallas: {results['exact_relay_pallas_int16']}")

    # full-coverage multi-hop halo on the production Pallas kernels: the
    # second bit-exact mechanism (all-gather-shaped, parallel sweeps) beside
    # the relay (minimal memory, serialized sweeps)
    out_ph = sharded_two_view_disparity(
        lb, rb, mesh, cc16, sgm_cfg, backend="pallas_interpret",
        halo=H - H // N_TILE, tile_mode="halo",
    )
    dph = np.asarray(out_ph.disparity)[0]
    vph = np.asarray(out_ph.valid)[0]
    results["full_halo_pallas_int16"] = {
        "halo_rows": H - H // N_TILE,
        "bit_identical_vs_single_chip_pallas": bool(
            (dph == np.asarray(ref_p.disparity)).all()
            and (vph == np.asarray(ref_p.valid)).all()
        ),
    }
    print(f"full halo pallas: {results['full_halo_pallas_int16']}")

    payload = {
        "shape": [H, W, D],
        "mesh": f"(1, {N_TILE}, 1) tile-sharded, virtual CPU devices",
        "oracle": "unsharded two_view_disparity backend=xla float32",
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
