"""Training CLI: 4-phase recipe (reference train.py / finetune.py).

Phases (SURVEY.md §2.25-2.29):
  1  local branch from scratch (Vimeo, bs 24, lr 2e-4 -> 1e-4)
  2  global branch pretrain, local frozen (Vimeo or X4K)
  3  joint finetune, alternating Vimeo/X4K (bs 16, lr 4e-5 -> 1e-5)
  4  perception finetune (adds VGG perceptual + style)

Example:
  python cli/train.py --phase 1 --variant base \
      --vimeo_path /data/vimeo_triplet --debug
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--phase", type=str, default="1", help="1|2|3|4 or name")
    p.add_argument("--variant", choices=["base", "lite"], default="base")
    p.add_argument("--vimeo_path", type=str, default=None)
    p.add_argument("--x4k_path", type=str, default=None)
    p.add_argument("--snu_path", type=str, default=None, help="val split dir")
    p.add_argument("--snu_img_path", type=str, default="")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_epoch", type=int, default=None)
    p.add_argument("--init_lr", type=float, default=None)
    p.add_argument("--last_lr", type=float, default=None)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--load_ckpt", type=str, default=None,
                   help="initial weights (.pt or .npz)")
    p.add_argument("--resume_train", action="store_true")
    p.add_argument("--model_checkpoints", type=str, default="./checkpoints")
    p.add_argument("--vgg_npz", type=str, default=None,
                   help="VGG16 weights for phase 4 perceptual loss")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--debug_iter", type=int, default=5)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--seed", type=int, default=22112023)
    args = p.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from atmvfi_tpu.data import DataLoader, SNUFilmDataset, VimeoDataset, X4KTrain
    from atmvfi_tpu.parallel import make_mesh
    from atmvfi_tpu.train import Trainer, TrainerConfig, get_phase
    from atmvfi_tpu.utils import seed_all

    seed_all(args.seed)
    phase = get_phase(args.phase)
    overrides = {}
    for field, arg in (("batch_size", args.batch_size),
                       ("num_epochs", args.num_epoch),
                       ("init_lr", args.init_lr),
                       ("last_lr", args.last_lr)):
        if arg is not None:
            overrides[field] = arg
    if overrides:
        phase = dataclasses.replace(phase, **overrides)

    train_loaders = []
    if args.vimeo_path and "vimeo90k" in phase.datasets:
        ds = VimeoDataset("train", args.vimeo_path, seed=args.seed)
        train_loaders.append(
            DataLoader(ds, phase.batch_size, shuffle=True,
                       num_workers=args.num_workers, seed=args.seed)
        )
    if args.x4k_path and "x4k" in phase.datasets:
        ds = X4KTrain(args.x4k_path, random_crop=True, patch_size=448,
                      min_t_step_size=2, max_t_step_size=32, seed=args.seed)
        bs = max(phase.batch_size // 3, 1)  # finetune.py:131 uses bs 5 vs 16
        train_loaders.append(
            DataLoader(ds, bs, shuffle=True,
                       num_workers=args.num_workers, seed=args.seed)
        )
    if not train_loaders:
        p.error("no training data: pass --vimeo_path (and --x4k_path)")

    if args.snu_path:
        val_ds = SNUFilmDataset("hard", args.snu_path, args.snu_img_path)
        val_loader = DataLoader(val_ds, 1, shuffle=False, drop_last=False,
                                num_workers=2)
    else:
        val_ds = VimeoDataset("test", args.vimeo_path)
        val_loader = DataLoader(val_ds, phase.batch_size, shuffle=False,
                                drop_last=False, num_workers=args.num_workers)

    init_variables = None
    if args.load_ckpt:
        if args.load_ckpt.endswith((".pt", ".pth")):
            from atmvfi_tpu.convert import load_torch_checkpoint

            init_variables, meta = load_torch_checkpoint(args.load_ckpt)
            print(f"loaded torch checkpoint; meta keys: {list(meta)}")
        else:
            from atmvfi_tpu.train.checkpoints import load_params_npz

            init_variables = load_params_npz(args.load_ckpt)

    perceptual = None
    if (phase.use_perceptual_loss or phase.use_style_loss):
        if args.vgg_npz:
            from atmvfi_tpu.losses import VGGPerceptualLoss

            perceptual = VGGPerceptualLoss(args.vgg_npz)
        else:
            print("WARNING: phase uses perceptual loss but no --vgg_npz; "
                  "perceptual/style terms disabled")

    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = Trainer(
        TrainerConfig(
            phase=phase, variant=args.variant,
            dtype=jnp.bfloat16 if args.bf16 else jnp.float32,
            steps_per_epoch=len(train_loaders[0]),
            num_epochs=phase.num_epochs if args.num_epoch is None else args.num_epoch,
            resume=args.resume_train,
            checkpoint_dir=args.model_checkpoints,
            seed=args.seed,
        ),
        mesh=mesh,
        perceptual_loss=perceptual,
        init_variables=init_variables,
    )
    n = sum(x.size for x in jax.tree.leaves(trainer.state.params))
    print(f"total parameters: {n/1e6:.2f} M | phase {phase.name} | "
          f"devices {jax.device_count()}")

    max_iters = args.debug_iter if args.debug else None
    trainer.fit(train_loaders, val_loader, max_iters=max_iters)


if __name__ == "__main__":
    main()
