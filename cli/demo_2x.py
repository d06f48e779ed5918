"""2x/4x/8x interpolation demo CLI (reference demo_2x.py equivalent).

Modes:
  2-frame:   --frame0 a.png --frame1 b.png -> writes the middle frame
  frame dir: --frames_dir dir/ (sorted images) -> writes Nx-interpolated
             frame sequence (and an mp4 if imageio-ffmpeg is available)
  video:     --video in.y4m (native, no deps) or in.mp4 (requires
             imageio-ffmpeg; gated) -> factor*fps output video
             (reference demo_2x.py:129-168's flagship mode)

Example:
  python cli/demo_2x.py --model_type lite --global_off \
      --frame0 f0.png --frame1 f1.png --out out.png
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model_type", choices=["base", "lite"], default="base")
    p.add_argument("--ckpt", type=str, default=None,
                   help=".pt (torch) or .npz (native) checkpoint")
    p.add_argument("--global_off", action="store_true",
                   help="disable the global motion branch")
    p.add_argument("--ensemble_global", action="store_true",
                   help="multiscale global motion ensemble (TTA-style)")
    p.add_argument("--frame0", type=str)
    p.add_argument("--frame1", type=str)
    p.add_argument("--frames_dir", type=str)
    p.add_argument("--video", type=str)
    p.add_argument("--out", type=str, default="output_interpolated")
    p.add_argument("--factor", type=int, default=2, choices=[2, 4, 8])
    p.add_argument("--batch", type=int, default=1,
                   help="pairs per forward call in stream modes "
                        "(throughput serving; same outputs as batch=1 "
                        "up to float reduction-order ulps)")
    p.add_argument("--fp32", action="store_true", help="f32 compute (parity)")
    p.add_argument("--fast", action="store_true",
                   help="serving profile: unchecked slab warps + composed "
                        "full-res warps (small documented deviation; "
                        "pair with --model_type lite for max fps)")
    p.add_argument("--combine_video", action="store_true",
                   help="also write an input-vs-output comparison strip")
    p.add_argument("--spatial_shards", type=int, default=1,
                   help="shard activations over N devices along height "
                        "(multi-chip 4K serving; uses XLA op impls — "
                        "see atmvfi_tpu/parallel/mesh.py)")
    args = p.parse_args()

    import numpy as np
    import jax.numpy as jnp

    from atmvfi_tpu.infer.pipeline import InterpolationPipeline, load_pipeline
    from atmvfi_tpu.models import Network, get_config
    from atmvfi_tpu.utils.images import read_image, write_image

    mesh = None
    if args.spatial_shards > 1:
        import jax

        from atmvfi_tpu.parallel import make_mesh

        mesh = make_mesh((1, args.spatial_shards),
                         jax.devices()[: args.spatial_shards])

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    if args.ckpt:
        pipeline = load_pipeline(
            args.ckpt, variant=args.model_type, dtype=dtype,
            global_motion=not args.global_off,
            ensemble_global_motion=args.ensemble_global,
            fast=args.fast, mesh=mesh,
        )
    else:
        print("WARNING: no --ckpt given; using random weights (smoke mode)")
        import jax

        cfg = get_config(args.model_type, dtype=dtype)
        net = Network(cfg)
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = net.init(jax.random.PRNGKey(0), dummy, dummy)
        pipeline = InterpolationPipeline(
            variables, variant=args.model_type, dtype=dtype,
            global_motion=not args.global_off,
            ensemble_global_motion=args.ensemble_global,
            fast=args.fast, mesh=mesh,
        )

    n_params = sum(
        x.size for x in __import__("jax").tree.leaves(pipeline.variables)
    )
    print(f"total parameters: {round(n_params / 1e6, 2)} M")

    if args.frame0 and args.frame1:
        img0 = read_image(args.frame0)
        img1 = read_image(args.frame1)
        mid = pipeline.interpolate(img0, img1)
        out = args.out if args.out.endswith(".png") else args.out + ".png"
        write_image(out, mid)
        print(f"wrote {out}")
        return

    if args.frames_dir:
        names = sorted(
            f for f in os.listdir(args.frames_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        sources = [read_image(os.path.join(args.frames_dir, n)) for n in names]
        os.makedirs(args.out, exist_ok=True)
        count = 0
        if args.batch > 1:
            stream = pipeline.interpolate_stream_batched(
                iter(sources), factor=args.factor, batch=args.batch
            )
        else:
            stream = pipeline.interpolate_stream(
                iter(sources), factor=args.factor
            )
        for i, frame in enumerate(stream):
            if args.combine_video:
                # stacked comparison: source (held N frames) above output
                # (reference combine_frame_vert, demo_2x.py:89-98)
                src = sources[min(i // args.factor, len(sources) - 1)]
                frame = np.concatenate([src, frame], axis=0)
            write_image(os.path.join(args.out, f"{i:06d}.png"), frame)
            count += 1
        print(f"wrote {count} frames to {args.out}/")
        return

    if args.video:
        if args.video.lower().endswith(".y4m"):
            from atmvfi_tpu.utils.video import Y4MReader, Y4MWriter

            reader = Y4MReader(args.video)
            fps_n, fps_d = reader.fps
            out_path = (
                args.out if args.out.endswith(".y4m") else args.out + ".y4m"
            )
            writer = Y4MWriter(
                out_path, reader.width, reader.height,
                fps=(fps_n * args.factor, fps_d),
                colorspace="C444" if reader.colorspace.startswith("C444")
                else "C420",
            )
            src = iter(reader)
            if args.combine_video:
                print("--combine_video applies to --frames_dir mode only")
            if args.batch > 1:
                stream = pipeline.interpolate_stream_batched(
                    src, factor=args.factor, batch=args.batch
                )
            else:
                stream = pipeline.interpolate_stream(src, factor=args.factor)
            count = 0
            for frame in stream:
                writer.write(frame)
                count += 1
            writer.close()
            reader.close()
            print(f"wrote {out_path}: {count} frames at "
                  f"{args.factor * reader.fps_float:g} fps")
            return
        try:
            import imageio.v2 as iio

            reader = iio.get_reader(args.video)
            meta = reader.get_meta_data()
            fps = meta.get("fps", 24)
        except Exception as e:
            print(f"video decode unavailable ({e}); use a .y4m input or "
                  f"--frames_dir instead")
            sys.exit(1)
        out_path = args.out if args.out.endswith(".mp4") else args.out + ".mp4"
        writer = iio.get_writer(out_path, fps=fps * args.factor)
        src = (np.asarray(f)[..., :3] for f in reader)
        if args.batch > 1:
            stream = pipeline.interpolate_stream_batched(
                src, factor=args.factor, batch=args.batch
            )
        else:
            stream = pipeline.interpolate_stream(src, factor=args.factor)
        for frame in stream:
            writer.append_data(frame)
        writer.close()
        print(f"wrote {out_path} at {fps * args.factor} fps")
        return

    p.error("one of --frame0/--frame1, --frames_dir, --video is required")


if __name__ == "__main__":
    main()
