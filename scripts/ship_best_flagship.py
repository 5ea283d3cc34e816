"""Ship the better of two flagship candidates into models/ffdnet_r3.

Round-3 runs two independent walks for the DE-GAP-FFDNet flagship
(VERDICT r2 "next" #1: >= 31.4 dB at the unbounded 180-iteration
schedule, /root/reference/test_ffdnet.sh:1-7):

  * models/ffdnet_r3   — polish of the in-framework lineage (incumbent)
  * models/ffdnet_ipol — finetune of the REAL IPOL net_gray prior

Both are floor-guarded at consolidation time, but they consolidate to
different names; this step evaluates every candidate at the exact
protocol schedule and copies the winner to models/ffdnet_r3 so
test_ffdnet.sh / bench.py score the best weights. Prints each
candidate's avg PSNR/SSIM for PARITY.md.

Usage: python scripts/ship_best_flagship.py [--candidates a,b,...]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidates", default="models/ffdnet_r3,"
                                            "models/ffdnet_ipol")
    ap.add_argument("--out", default="models/ffdnet_r3")
    ap.add_argument("--maxiter", type=int, default=180)
    args = ap.parse_args()

    from deqsci_tpu.cli import video_sci

    scores = {}
    for cand in args.candidates.split(","):
        path = os.path.join(REPO, cand)
        if not os.path.isdir(path):
            print(f"{cand}: absent, skipped", flush=True)
            continue
        r = video_sci.main([
            "--denoiser", "ffdnet", "--loadpath", path,
            "--testpath", "/root/reference/data/test_gray/",
            "--savepath", os.path.join(REPO, "save/ship_eval"),
            "--inference", "True", "--and_maxiters", str(args.maxiter)])
        scores[cand] = (float(r["avg_psnr"]), float(r["avg_ssim"]))
        print(f"{cand}: {r['avg_psnr']:.2f} dB / {r['avg_ssim']:.4f} SSIM",
              flush=True)

    if not scores:
        print("no candidates found", flush=True)
        return
    winner = max(scores, key=lambda c: scores[c][0])
    print(f"winner: {winner} ({scores[winner][0]:.2f} dB)", flush=True)
    out_dir = os.path.join(REPO, args.out)
    if os.path.abspath(os.path.join(REPO, winner)) != os.path.abspath(out_dir):
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        shutil.copytree(os.path.join(REPO, winner), out_dir)
        print(f"copied {winner} -> {args.out}", flush=True)
    else:
        print(f"{args.out} already holds the winner", flush=True)


if __name__ == "__main__":
    main()
