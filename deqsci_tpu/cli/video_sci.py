"""Flag-compatible CLI: the rebuild of video_sci_proxgrad.py.

Same 18 flags (video_sci_proxgrad.py:23-49) and the same quirks where they
are behavioral: ``--inference`` is truthy for ANY non-empty string including
"False" (line 45/55 — the shell scripts rely on ``--inference True``);
``--n_epochs``/``--and_maxiters`` accept strings; the step size is the
hard-coded initial_eta=0.2 regardless of --etainit (line 70). ``--gpu_ids``
is accepted and ignored (device selection is JAX's).

Examples (mirroring the reference shell runners):

  python -m deqsci_tpu.cli.video_sci --savepath ./save/test_cnn/ \
      --testpath /root/reference/data/test_gray/ \
      --loadpath /root/reference/models/cnn.ckpt \
      --denoiser SimpleCNN --inference True
"""

from __future__ import annotations

import argparse
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--gpu_ids", default="0", help="accepted for "
                   "compatibility; device selection is JAX's")
    p.add_argument("--n_epochs", default=80)
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--and_maxiters", default=100)
    p.add_argument("--and_beta", type=float, default=1.0)
    p.add_argument("--and_m", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--etainit", type=float, default=0.9)
    p.add_argument("--lr_gamma", type=float, default=0.9)
    p.add_argument("--sched_step", type=int, default=10)
    p.add_argument("--savepath", default="./save/test_ffdnet1/")
    p.add_argument("--trainpath", default="./data/DAVIS/matlab/")
    p.add_argument("--testpath", default="./data/test_gray/")
    p.add_argument("--loadpath", default="")
    p.add_argument("--denoiser", default="ffdnet")
    p.add_argument("--inference", default=False,
                   help="any non-empty value (incl. 'False') enables "
                   "inference mode — reference-compatible quirk")
    p.add_argument("--print_every_n_steps", type=int, default=1)
    p.add_argument("--save_every_n_steps", type=int, default=50)
    p.add_argument("--sigma", type=int, default=0)
    p.add_argument("--sci_solver", default="gap", choices=["gap", "admm"],
                   help="iteration map: GAP prox-grad (reference default) "
                   "or ADMM (present-but-unwired upstream: "
                   "solvers/equilibrium_solvers_yaping.py:438-465)")
    p.add_argument("--precision", default="packed",
                   choices=["packed", "high", "highest"],
                   help="conv scheme for the denoiser body: 'packed' "
                        "(split2 bf16, production default, -0.003 dB vs "
                        "'high' at 1.25x speed), 'high' (3-pass bf16), "
                        "'highest' (true fp32, oracle studies)")
    p.add_argument("--backward", default=None,
                   choices=["solver", "neumann", "passthrough"],
                   help="DEQ gradient scheme: 'solver' = exact IFT "
                        "(reference DEQFixedPoint), 'neumann' = truncated "
                        "Neumann series (DEQFixedPointNeumann, "
                        "new_equilibrium_utils_yaping.py:331-365 — bounded "
                        "gradients for long-horizon training). Unset = the "
                        "reference default for the chosen solver: 'solver' "
                        "for gap, 'passthrough' for admm (the reference's "
                        "hook-disabled DEQFixedPointADMM — which has "
                        "exactly zero parameter gradient; pass an explicit "
                        "--backward to actually train ADMM)")
    p.add_argument("--neumann_k", type=int, default=10)
    p.add_argument("--fold_bn", type=int, default=0,
                   help="inference only: fold the denoiser's inference "
                   "BatchNorms into the adjacent conv kernels at weight "
                   "load (pure affine; also pre-scales the packed bf16 "
                   "weights). BN-carrying denoisers (ffdnet, DnCNN) only")
    p.add_argument("--skip_loss_threshold", type=float, default=0.0,
                   help="discard the update of any batch whose loss "
                   "exceeds this (0 = off, reference semantics); guards "
                   "long-horizon training against diverged-solve outliers")
    p.add_argument("--grad_clip", type=float, default=0.0,
                   help="global-norm gradient clip (0 = off, the "
                        "reference recipe); >0 stabilizes 180-iteration "
                        "equilibrium training")
    p.add_argument("--shuffle", type=int, default=1,
                   help="shuffle training samples each epoch (the "
                   "reference's DataLoader(shuffle=True), "
                   "video_sci_proxgrad.py:135); 0 = fixed order")
    p.add_argument("--shuffle_seed", type=int, default=0)
    p.add_argument("--cache_clips", type=int, default=1,
                   help="preload+memoize decoded training clips in RAM "
                   "(~2.3 MB/clip) so .mat decode cannot starve the "
                   "device on weak hosts; 0 = decode per access "
                   "(reference DataLoader behavior)")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="track an EMA of the weights during training and "
                   "let it compete for the best checkpoint (0 = off, "
                   "reference semantics)")
    p.add_argument("--self_ensemble", type=int, default=0,
                   help="inference only: average the reconstructions of "
                   "the 8 dihedral-transformed (meas, mask) problems (the "
                   "SCI forward model is exactly equivariant; only "
                   "denoiser bias differs). 1 = sequential (8x solves), "
                   "2 = batched (all 8 problems in ONE per-lane-mask XLA "
                   "program via recon.multi)")
    p.add_argument("--sigma_min", type=float, default=0.0,
                   help="floor for the FFDNet sigma schedule in [0,255] "
                   "units (0 = reference semantics: unbounded decay); "
                   "stabilizes long solves with denoisers that are not "
                   "contractive at tiny sigma")
    p.add_argument("--maxiter_mix", default="",
                   help="training only: comma list of solve horizons; "
                   "each batch samples one uniformly and trains the DEQ "
                   "at that budget (mixed-horizon curriculum — trains the "
                   "weights to be a fixed point at EVERY budget in the "
                   "set, flattening quality-vs-iterations tails). Eval "
                   "still runs at --and_maxiters")
    p.add_argument("--sigma_dual", type=float, default=0.0,
                   help="ADMM+ffdnet only: floor sigma at coef*RMS(dual) — "
                   "an ADMM-native self-annealing curriculum (strong "
                   "denoising while the splitting disagrees, decaying as "
                   "the fixed point is approached); 0 = off")
    return p


def resolve_backward(sci_solver: str, backward, neumann_k: int,
                     inference: bool) -> dict:
    """Map the --backward flag to make_deq kwargs.

    Unset (None) means the reference default for the chosen iteration map:
    exact-IFT 'solver' for gap (DEQFixedPoint), 'passthrough' for admm
    (the hook-disabled DEQFixedPointADMM,
    new_equilibrium_utils_yaping.py:414-451 — zero parameter gradient).
    An explicit value is always honored (round-3 fix: '--backward solver'
    with admm used to be silently rewritten to passthrough)."""
    if sci_solver == "admm":
        if backward is None:
            if not inference:
                print("WARNING: --sci_solver admm defaults to the "
                      "reference's hook-disabled backward (zero parameter "
                      "gradient — training is a no-op); pass --backward "
                      "solver or --backward neumann to train ADMM",
                      flush=True)
            return dict(backward="passthrough")
        return dict(backward=backward, neumann_k=int(neumann_k))
    if backward is not None and backward != "solver":
        return dict(backward=backward, neumann_k=int(neumann_k))
    return {}


def main(argv=None):
    args = build_parser().parse_args(argv)
    inference = bool(args.inference)

    import cv2
    import jax
    import numpy as np

    from deqsci_tpu.data.sci_mat import SCITestDataset, SCITrainingDataset
    from deqsci_tpu.fp.deq import make_deq
    from deqsci_tpu.io.checkpoint import CheckpointManager
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_dataset
    from deqsci_tpu.train.loop import train_solver_sci
    from deqsci_tpu.zoo import build_denoiser, load_reference_weights

    print("devices:", jax.devices(), flush=True)

    fold_bn = bool(int(args.fold_bn)) and inference and \
        args.denoiser in ("ffdnet", "DnCNN", "RealSN_DnCNN", "dncnn_norm")

    def build_spec_step(feats=0):
        spec = build_denoiser(args.denoiser, precision=args.precision,
                              bn_fold=fold_bn, feats=feats)
        sigma_kw = {}
        if args.sigma_min:
            sigma_kw["sigma_min"] = float(args.sigma_min) / 255.0
        if args.sci_solver == "admm":
            from deqsci_tpu.maps.admm_sci import make_admm_sci_step
            from deqsci_tpu.ops.sensing import initial_point_admm
            if float(args.sigma_dual):
                sigma_kw["sigma_dual_coef"] = float(args.sigma_dual)
            step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag,
                                      **sigma_kw)
            recon_kw = dict(init_fn=initial_point_admm,
                            output_fn=lambda c: c[0])
            deq_kw = resolve_backward("admm", args.backward,
                                      args.neumann_k, inference)
        else:
            step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag,
                                     **sigma_kw)
            recon_kw = {}
            deq_kw = resolve_backward("gap", args.backward,
                                      args.neumann_k, inference)
        return spec, step, recon_kw, deq_kw

    spec, step, recon_kw, deq_kw = build_spec_step()

    load_location = args.loadpath
    if args.sigma:
        load_location = (f"./networks/provable/Pretrained_models/"
                         f"{args.denoiser}_noise{args.sigma}.pth")

    ckpt_mgr = CheckpointManager(os.path.join(args.savepath, "model"))
    start_epoch = 0
    if load_location and os.path.exists(load_location):
        if os.path.isdir(load_location) or ckpt_mgr.exists(load_location):
            snap = ckpt_mgr.restore(load_location, with_optimizer=False) \
                if ckpt_mgr.exists(load_location) else None
            if snap is None:
                import orbax.checkpoint as ocp
                snap = ocp.StandardCheckpointer().restore(
                    os.path.abspath(load_location))
            variables = snap["params"]
            start_epoch = int(snap.get("epoch", -1)) + 1
            print("loaded native checkpoint!", flush=True)
        else:
            variables, _sn = load_reference_weights(args.denoiser,
                                                    load_location)
            print("loaded dict!", flush=True)
    else:
        variables = spec.init_variables()
        if load_location:
            print(f"loadpath {load_location} not found; "
                  "using random init", flush=True)

    if args.denoiser == "ffdnet":
        # rebuild the module at the width the weights were trained at
        # (widened checkpoints from scripts/widen_ffdnet.py carry 96/128
        # hidden channels; the flag-free default stays the reference's 64)
        from deqsci_tpu.zoo import infer_denoiser_feats
        feats = infer_denoiser_feats(variables)
        if feats and feats != spec.module._cfg["feats"]:
            print(f"checkpoint hidden width {feats} != module default; "
                  "rebuilding", flush=True)
            spec, step, recon_kw, deq_kw = build_spec_step(feats)

    if fold_bn and any(k.startswith("bn")
                       for k in variables.get("params", {})):
        from deqsci_tpu.nets.dncnn import fold_batchnorm
        variables = fold_batchnorm(variables)
        print("folded inference BatchNorms into conv kernels", flush=True)

    solver_kw = dict(m=int(args.and_m), beta=float(args.and_beta),
                     lam=1e-2, max_iter=int(args.and_maxiters), tol=1e-5)

    if inference:
        from deqsci_tpu.train.eval import evaluate_file
        recon = make_reconstructor(step, **recon_kw, **solver_kw)
        if int(args.self_ensemble):
            from deqsci_tpu.recon import make_self_ensemble
            batched = int(args.self_ensemble) >= 2
            recon = make_self_ensemble(recon, batched=batched)
            print(f"dihedral self-ensemble: on "
                  f"({'one batched program' if batched else '8x solves'})",
                  flush=True)
        ds = SCITestDataset(args.testpath)
        img_dir = os.path.join(args.savepath, "img", "test")
        os.makedirs(img_dir, exist_ok=True)
        psnrs, ssims = [], []
        for data in ds:
            r = evaluate_file(recon, variables, data)
            psnrs.append(r["psnr"])
            ssims.append(r["ssim"])
            print(f"{data['file']}  PSNR: {r['psnr']:.2f} dB  "
                  f"SSIM: {r['ssim']:.4f}", flush=True)
            rec = np.round(np.clip(r["recon"], 0, 1) * 255.0).astype(np.uint8)
            n_t = rec.shape[-1]
            for fi in range(rec.shape[0]):
                for t in range(n_t):
                    cv2.imwrite(os.path.join(
                        img_dir,
                        f"{data['file']}_reconstruction_{fi * n_t + t}.png"),
                        rec[fi, :, :, t])
        avg = float(np.mean(psnrs))
        print("---------------------------------",
              f"Total Average PSNR: {avg:.2f} dB", flush=True)
        return {"avg_psnr": avg, "avg_ssim": float(np.mean(ssims))}

    # training
    if args.maxiter_mix:
        hs = sorted({int(v) for v in args.maxiter_mix.split(",")})
        deq = {h: make_deq(step, **deq_kw, **dict(solver_kw, max_iter=h))
               for h in hs}
        print(f"mixed-horizon training over {hs} "
              f"(eval at {solver_kw['max_iter']})", flush=True)
    else:
        deq = make_deq(step, **deq_kw, **solver_kw)
    from deqsci_tpu.dist.mesh import ProcessShardedDataset
    train_ds = SCITrainingDataset(
        os.path.join(args.trainpath, "gt/"),
        os.path.join(args.trainpath, "measurement/"),
        os.path.join(args.trainpath, "mask.mat"),
        cache_clips=bool(int(args.cache_clips)))
    if train_ds.cache_clips:
        t0 = time.time()
        train_ds.preload()
        print(f"cached {len(train_ds)} training clips in RAM "
              f"({time.time() - t0:.1f} s)", flush=True)
    base_dataset = ProcessShardedDataset(
        train_ds,
        shuffle_seed=int(args.shuffle_seed) if int(args.shuffle) else None)

    if int(args.batch_size) > 1:
        bs = int(args.batch_size)

        class _Batched:
            """Collate bs consecutive samples (drop_last, like the
            reference's DataLoader(drop_last=True))."""

            def __iter__(self):
                buf = []
                for s in base_dataset:
                    buf.append(s)
                    if len(buf) == bs:
                        yield {k: np.stack([b[k] for b in buf])
                               for k in ("gt", "meas", "mask")}
                        buf = []

        dataset = _Batched()
    else:
        dataset = base_dataset
    # decode the next batch on a host thread while the device runs the
    # current step (the reference's DataLoader(num_workers=2) analog,
    # video_sci_proxgrad.py:135) — hides the 64-220 ms/batch .mat decode
    from deqsci_tpu.data.prefetch import PrefetchIterator
    dataset = PrefetchIterator(dataset, depth=2)
    test_ds = SCITestDataset(args.testpath)
    recon = make_reconstructor(step, **recon_kw, **solver_kw)

    def eval_fn(params):
        s = evaluate_dataset(recon, params, test_ds, verbose=True,
                             compute_ssim=False)
        return s["avg_psnr"]

    def save_fn(tag, snapshot):
        ckpt_mgr.save(tag, snapshot)
        print("dict saved!", flush=True)

    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(args.savepath)
    except ImportError:
        pass

    train_kw = {}
    if args.sci_solver == "admm":
        from deqsci_tpu.ops.sensing import initial_point_admm
        train_kw = dict(init_fn=initial_point_admm,
                        output_fn=lambda c: c[0])
    return train_solver_sci(
        deq, variables, dataset, grad_clip=float(args.grad_clip),
        skip_loss_threshold=float(args.skip_loss_threshold),
        ema_decay=float(args.ema_decay),
        n_epochs=int(args.n_epochs), base_lr=float(args.lr),
        sched_step=int(args.sched_step), lr_gamma=float(args.lr_gamma),
        start_epoch=start_epoch, eval_fn=eval_fn, save_fn=save_fn,
        save_every_n_steps=int(args.save_every_n_steps),
        print_every_n_steps=int(args.print_every_n_steps),
        writer=writer, **train_kw)


if __name__ == "__main__":
    main()
