"""CLI driver: render any of the catalog scenes (22 reference + extensions).

Replaces the reference's interactive stdin menu (src/main.cc:633-686) with
argparse flags (the config system the reference README promises but never
implements — SURVEY.md appendix item 9), while keeping an interactive mode
(`--interactive`) that mirrors the original prompt flow.

Examples:
    python render.py cornell_box -o cornell.png
    python render.py sphereflake --width 400 --spp 50 --format ppm
    python render.py --list
    python render.py --interactive        # the reference's stdin flow
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("scene", nargs="?", help="scene name (see --list) or 1-based index")
    p.add_argument("-o", "--output", default=None, help="output path (.png or .ppm)")
    p.add_argument("--width", type=int, default=None, help="image width override")
    p.add_argument("--spp", type=int, default=None, help="samples per pixel override")
    p.add_argument("--max-depth", type=int, default=None, help="bounce depth override")
    p.add_argument("--seed", type=int, default=0, help="RNG seed")
    p.add_argument("--stratify", action="store_true",
                   help="stratified pixel jitter: sample s of spp jitters "
                        "within cell s of an exact grid over the pixel "
                        "(lower variance at equal cost; off = reference-"
                        "parity uniform jitter)")
    p.add_argument("--adaptive", type=float, default=None, metavar="REL_TOL",
                   help="adaptive sampling: per-pixel 95%% CI termination "
                        "at this relative luminance tolerance (e.g. 0.05); "
                        "--spp becomes the per-pixel max")
    p.add_argument("--denoise", action="store_true",
                   help="edge-avoiding a-trous denoise (utils/denoise.py) "
                        "guided by first-hit AOVs before writing the image")
    p.add_argument("--aovs", default=None, metavar="PREFIX",
                   help="also write first-hit AOV buffers (normal/albedo/"
                        "depth/coverage) as PREFIX_<name>.png")
    p.add_argument("--tonemap", choices=("none", "reinhard", "aces"),
                   default=None,
                   help="HDR tone map before gamma for png/ppm output "
                        "(default none = reference-parity hard clamp)")
    p.add_argument("--tile-pixels", type=int, default=None, metavar="N",
                   help="render in fixed N-pixel tiles (bounds device "
                        "memory for very large frames; identical output)")
    p.add_argument("--qmc", action="store_true",
                   help="Owen-scrambled Sobol sampling: every dimension "
                        "pair draws from a per-pixel-scrambled (0,2)-"
                        "sequence (lower variance at equal spp; measured "
                        ">=2x MSE win at 16 spp)")
    p.add_argument("--nee", action="store_true",
                   help="next-event estimation: explicit shadow-ray light "
                        "sample + pure BSDF continuation per diffuse "
                        "bounce, power-heuristic MIS (lower variance than "
                        "the default 50/50 one-sample mixture)")
    p.add_argument("--rr-depth", type=int, default=None, metavar="N",
                   help="Russian-roulette path termination from bounce N "
                        "(unbiased; frees deep-path lanes — the wavefront "
                        "integrator refills them)")
    p.add_argument("--wavefront", choices=("auto", "on", "off"),
                   nargs="?", const="on", default="auto",
                   help="path-regeneration wavefront integrator: lanes "
                        "refill from the (pixel, sample) queue the moment "
                        "a path dies, so work = actual path segments "
                        "instead of pixels*spp*max_depth (forward-only; "
                        "per-path radiance bitwise-equal to the classic "
                        "scan, image allclose). Default 'auto' uses it for "
                        "chunked/accelerated scenes with an auto-sized "
                        "lane pool (measured v5e round 5: colonnade full "
                        "workload 2.85 s vs 4.9 s at one-lane-per-pixel "
                        "and ~9 s on the scan); dense scenes keep the "
                        "unrolled scan, which is 5x faster there — refill "
                        "bookkeeping swamps the cheap dense intersect)")
    p.add_argument("--clamp", type=float, default=None, metavar="C",
                   help="firefly clamp: per-sample radiance min'd against C "
                        "per channel (variance/bias trade; off by default)")
    p.add_argument("--format", choices=("png", "ppm", "exr"), default=None,
                   help="output container (default: from output extension, "
                        "else png); exr writes linear HDR radiance")
    p.add_argument("--sharded", action="store_true",
                   help="shard pixels over all available devices")
    p.add_argument("--checkpoint", default=None, metavar="PATH",
                   help="spp-chunked render with resume from PATH")
    p.add_argument("--chunk-spp", type=int, default=16,
                   help="samples per checkpoint chunk (with --checkpoint)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="write a jax.profiler device trace to DIR")
    p.add_argument("--config", default=None, metavar="JSON",
                   help="load render settings from a JSON config file "
                        "(CLI flags override)")
    p.add_argument("--save-config", default=None, metavar="JSON",
                   help="write the resolved settings to a JSON config file")
    p.add_argument("--list", action="store_true", help="list scenes and exit")
    p.add_argument("--interactive", action="store_true",
                   help="prompt for filename + scene number like the reference")
    return p


CONFIG_KEYS = ("scene", "output", "width", "spp", "max_depth", "seed",
               "format", "sharded", "checkpoint", "chunk_spp", "stratify",
               "denoise", "aovs", "adaptive", "clamp", "qmc", "tonemap",
               "tile_pixels", "rr_depth", "nee", "wavefront")


def use_wavefront(mode: str, scene) -> bool:
    """Forward-render integrator routing. 'auto' (the default) picks the
    path-regeneration wavefront for chunked/accelerated scenes — measured
    on one v5e chip (2026-08-20): colonnade 1.29x, sphereflake 1.46x
    faster at identical images — and the unrolled classic scan for dense
    tables, where the wavefront is 5x SLOWER (Cornell 512px d8: 1.83 s vs
    0.34 s; refill bookkeeping + an un-unrollable while_loop swamp the
    cheap [R,18] intersect). Numbers: BASELINE.md round-4 section."""
    if mode == "on" or mode is True:    # bool: pre-round-4 JSON configs
        return True
    if mode == "off" or mode is False:
        return False
    return (scene.tri_chunks is not None or scene.sphere_chunks is not None
            or scene.quad_chunks is not None)


def validate_flags(args) -> str | None:
    """Flag-combination contract (VERDICT r04 weak 2: combinations must
    compose or error, never silently drop a flag). Returns an error
    message, or None when the combination composes:

    - --sharded composes with --tile-pixels (per-shard scan pixel
      batching / wavefront lane-pool cap).
    - --checkpoint composes with --wavefront (spp chunks through the
      wavefront's sample_offset), --sharded (each chunk's pixels shard
      over the mesh, bitwise-interoperable checkpoints) and
      --tile-pixels (maps to the scan's pixel batching / the wavefront's
      lane-pool cap); it rejects --adaptive. --adaptive owns its
      compaction loop: it composes with --sharded only.
    - --wavefront composes with --sharded (per-device wavefronts over
      pixel shards, parallel/mesh.py) and with --tile-pixels (wavefront
      per pixel tile).
    - --sharded + --tile-pixels is rejected (sharding already splits the
      pixel axis; combine with a smaller shard instead).
    """
    wf_on = args.wavefront in ("on", True)
    if args.checkpoint and args.adaptive is not None:
        return "--checkpoint does not compose with --adaptive"
    if args.adaptive is not None:
        for flag, name in ((wf_on, "--wavefront on"),
                           (args.tile_pixels, "--tile-pixels")):
            if flag:
                return f"--adaptive does not compose with {name}"
    return None


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.config:
        # the config system the reference README promises but never ships
        # (SURVEY.md appendix item 9): JSON defaults, CLI flags win.
        # Re-parse with every default suppressed so the namespace contains
        # exactly the flags the user typed — a config value fills any key the
        # CLI left unset, including keys with non-None defaults (chunk_spp,
        # seed).
        import json as _json

        with open(args.config) as f:
            cfg = _json.load(f)
        probe = build_parser()
        for action in probe._actions:
            action.default = argparse.SUPPRESS
        provided = vars(probe.parse_args(argv))
        for k, v in cfg.items():
            if k in CONFIG_KEYS and k not in provided:
                setattr(args, k, v)

    if args.save_config:
        import json as _json

        with open(args.save_config, "w") as f:
            _json.dump({k: getattr(args, k) for k in CONFIG_KEYS
                        if getattr(args, k) is not None}, f, indent=1)
        print(f"Wrote config to {args.save_config}")

    import jax

    from cpu_ray_tracing_implementation_tpu.models import catalog, film, integrator

    names = list(catalog.SCENES)

    if args.list:
        for i, n in enumerate(names, 1):
            print(f"{i:2d}  {n}")
        return 0

    if args.interactive:
        out = input("Enter Output Filename: ").strip()
        for i, n in enumerate(names, 1):
            print(f"{i:2d}. {n}")
        which = int(input("Enter the scene number: "))
        args.scene = names[which - 1]
        args.output = out
    elif args.scene is None:
        build_parser().error("scene name required (or --list / --interactive)")

    scene_name = args.scene
    if scene_name.isdigit():
        scene_name = names[int(scene_name) - 1]
    if scene_name not in catalog.SCENES:
        print(f"unknown scene {scene_name!r}; see --list", file=sys.stderr)
        return 2

    out = args.output or f"{scene_name}.png"
    low = out.lower()
    fmt = args.format or ("ppm" if low.endswith(".ppm")
                          else "exr" if low.endswith(".exr") else "png")

    scene, cam = catalog.SCENES[scene_name](
        width=args.width, spp=args.spp, max_depth=args.max_depth)
    if args.stratify:
        cam = cam.replace(stratify=True)
    if args.clamp is not None:
        cam = cam.replace(clamp=args.clamp)
    if args.qmc:
        cam = cam.replace(qmc=True)
    if args.nee:
        cam = cam.replace(nee=True)
    if args.rr_depth is not None:
        cam = cam.replace(rr_depth=args.rr_depth)
    print(f"Rendering {scene_name}: {cam.width}x{cam.height}, "
          f"{cam.spp} spp, depth {cam.max_depth} on {jax.devices()[0].platform}")

    from cpu_ray_tracing_implementation_tpu.utils import profiling

    err = validate_flags(args)
    if err:
        build_parser().error(err)

    key = jax.random.key(args.seed)
    t0 = time.time()
    with profiling.device_trace(args.profile):
        wavefront = use_wavefront(args.wavefront, scene)
        sharded = args.sharded and len(jax.devices()) > 1
        if args.sharded and not sharded:
            print("--sharded: only one device visible; rendering single-chip")
        if args.checkpoint:
            # validate_flags rejected everything checkpoint can't compose
            # with; the integrator routing composes (wavefront chunks via
            # sample_offset on chunked scenes / --wavefront on)
            from cpu_ray_tracing_implementation_tpu.utils import checkpoint as ckpt

            cmesh = None
            if sharded:
                from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

                cmesh = pm.make_mesh()
            img = ckpt.render_with_checkpoint(scene, cam, seed=args.seed,
                                              chunk_spp=args.chunk_spp,
                                              ckpt_path=args.checkpoint,
                                              use_wavefront=wavefront,
                                              mesh=cmesh,
                                              batch_pixels=args.tile_pixels)
        elif args.adaptive is not None:
            from cpu_ray_tracing_implementation_tpu.models import adaptive

            amesh = None
            if sharded:
                from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

                amesh = pm.make_mesh()
            img, spp_map = adaptive.render_image_adaptive(
                scene, cam, key, rel_tol=args.adaptive,
                return_spp_map=True, mesh=amesh)
            print(f"Adaptive spp: mean {spp_map.mean():.1f}, "
                  f"min {spp_map.min()}, max {spp_map.max()} "
                  f"(budget {cam.spp})")
        elif sharded:
            # --sharded composes with the integrator routing (VERDICT r04
            # weak 2: it used to be silently swallowed on chunked scenes)
            from cpu_ray_tracing_implementation_tpu.parallel import mesh as pm

            if wavefront:
                img = pm.render_image_wavefront_sharded(
                    scene, cam, key, pm.make_mesh(),
                    lanes_cap=args.tile_pixels)
            else:
                img = pm.render_image_sharded(scene, cam, key, pm.make_mesh(),
                                              batch_pixels=args.tile_pixels)
        elif wavefront:
            img = integrator.render_image_wavefront(
                scene, cam, key, tile_pixels=args.tile_pixels)
        elif args.tile_pixels:
            img = integrator.render_image_tiled(scene, cam, key,
                                                tile_pixels=args.tile_pixels)
        else:
            img = integrator.render_image(scene, cam, key)
        import numpy as np

        if args.denoise or args.aovs:
            from cpu_ray_tracing_implementation_tpu.models import aov as aov_mod

            bufs = aov_mod.render_aovs(scene, cam, key,
                                       spp=min(cam.spp, 16))
            if args.denoise:
                from cpu_ray_tracing_implementation_tpu.utils import denoise

                img = denoise.denoise(img, bufs)
            if args.aovs:
                for name, b in bufs.items():
                    v = np.asarray(b)
                    if name == "normal":
                        v = 0.5 * (v + 1.0)  # [-1,1] -> display range
                    elif name == "depth":
                        v = v / max(float(v.max()), 1e-6)
                    if v.shape[-1] == 1:
                        v = np.repeat(v, 3, axis=-1)
                    film.write_png(f"{args.aovs}_{name}.png", v)
                print(f"Wrote AOVs to {args.aovs}_*.png")
        a = np.asarray(img)
    dt = time.time() - t0
    rays = cam.width * cam.height * cam.spp
    print(f"Done in {dt:.2f}s ({rays / dt / 1e6:.2f}M camera rays/s)")

    if fmt == "ppm":
        film.write_ppm(out, np.asarray(film.tonemap(a, args.tonemap)))
    elif fmt == "exr":
        film.write_exr(out, a)  # EXR keeps raw linear radiance
    else:
        film.write_png(out, a, tonemap_mode=args.tonemap)
    print(f"Wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
