"""Train the reference torch modules on CPU -> a genuinely TRAINED .pth.

Closes VERDICT r3 item #4 ("trained-at-convergence behavioral parity"):
the A/B eval in ``tools/ab_parity.py`` previously ran on random-init
weights with the output logits scaled x16 to emulate saturation.  This
tool produces the real thing: it drives the reference's own torch
modules (read-only via ``tests.reference_loader``) through a few hundred
CPU iterations of the reference's training objective — warped
log-magnitude U-Net input (reference ``main.py:61-95``), weighted BCE on
binary masks against per-source visual features (reference
``main.py:557-569`` / ``criterion.py:44-49``), SGD with the reference's
per-net LR groups (``main.py:601-612``) — and writes ``sound_trained.pth``
/ ``frame_trained.pth`` in the reference's per-net ``state_dict`` layout.

Feed the result to ``tools/ab_parity.py --weights_sound ... --weights_frame
...`` to A/B the full eval protocol on TRAINED weights (both frameworks,
same batches), or the reverse: export an avsep_tpu-trained checkpoint with
``tools/export_reference_ckpt.py`` and pass THOSE .pth files here as
``--init_sound/--init_frame`` to continue training them in torch (proves
the export side loads and optimizes).

Usage:
    python tools/train_reference_torch.py --list_train /tmp/toyset/train.csv \
        --iters 300 --batch 8 --imgsize 64 --out /tmp/ref_trained
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_FFT, HOP = 1022, 256


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--list_train", required=True)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--imgsize", type=int, default=64)
    ap.add_argument("--audlen", type=int, default=65535)
    ap.add_argument("--lr_sound", type=float, default=1e-3)
    ap.add_argument("--lr_frame", type=float, default=1e-4)
    ap.add_argument("--momentum", type=float, default=0.9)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="/tmp/ref_trained")
    ap.add_argument("--init_sound", default="",
                    help="warm-start the torch U-Net from this .pth "
                         "(e.g. an export_reference_ckpt.py artifact)")
    ap.add_argument("--init_frame", default="")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # dataset only; no TPU
    import torch
    import torch.nn.functional as F

    from avsep_tpu.config import Config
    from avsep_tpu.data.dataset import MusicMixDataset
    from avsep_tpu.data.loader import BatchLoader, iter_forever
    from avsep_tpu.data.video_transforms import IMAGENET_MEAN, IMAGENET_STD
    from avsep_tpu.ops.warp import warpgrid
    from tests.reference_loader import load_reference_models
    from tests.test_resnet_parity import TResNet18

    torch.manual_seed(args.seed)

    cfg = Config(num_mix=2, num_frames=3, one_frame=True,
                 audLen=args.audlen, audRate=11025, imgSize=args.imgsize,
                 batch_size_per_gpu=args.batch, num_gpus=1,
                 binary_mask=1, weighted_loss=1, train_repeat=50,
                 rate_dc=1, max_silent=0.87)
    ds = MusicMixDataset(args.list_train, cfg, split="train")
    loader = BatchLoader(ds, args.batch, num_workers=2, seed=args.seed,
                         drop_last=True)
    it = iter_forever(loader)

    audio_net = load_reference_models()[0]
    tunet = audio_net.Unet(fc_dim=2, num_downs=7, fusion_type="hidsep",
                           att_type="sig").train()
    ttrunk = TResNet18().train()
    tfc = torch.nn.Conv2d(512, 256, 3, padding=1)
    if args.init_sound:
        tunet.load_state_dict(torch.load(args.init_sound,
                                         map_location="cpu"))
    if args.init_frame:
        sd = torch.load(args.init_frame, map_location="cpu")
        tfc.load_state_dict({"weight": sd.pop("fc.weight"),
                             "bias": sd.pop("fc.bias")})
        ttrunk.load_state_dict(sd)

    # reference main.py:601-612: one SGD, per-net LR groups
    opt = torch.optim.SGD(
        [{"params": tunet.parameters(), "lr": args.lr_sound},
         {"params": ttrunk.parameters(), "lr": args.lr_frame},
         {"params": tfc.parameters(), "lr": args.lr_frame}],
        momentum=args.momentum, weight_decay=args.weight_decay)

    w = torch.hann_window(N_FFT, periodic=True)
    mean = torch.from_numpy(IMAGENET_MEAN)
    std = torch.from_numpy(IMAGENET_STD)

    def spect(x):  # [*, L] -> complex [*, 512, T]
        return torch.stft(x, n_fft=N_FFT, hop_length=HOP, window=w,
                          center=True, pad_mode="reflect",
                          return_complex=True)

    t0 = time.time()
    losses = []
    for i in range(1, args.iters + 1):
        batch = next(it)
        B = batch["audio_mix"].shape[0]
        N = batch["audios"].shape[1]
        mix = torch.from_numpy(batch["audio_mix"]).float()
        srcs = torch.from_numpy(batch["audios"]).float()

        with torch.no_grad():
            mag_mix = spect(mix).abs()[:, None] + 1e-10     # [B,1,512,T]
            mags = spect(srcs.reshape(B * N, -1)).abs() \
                .reshape(B, N, N_FFT // 2 + 1, -1)          # [B,N,512,T]
            T = mag_mix.shape[-1]
            grid = torch.from_numpy(warpgrid(B, 256, T, True))
            mag_mix = F.grid_sample(mag_mix, grid, align_corners=False)
            mags = F.grid_sample(mags, grid, align_corners=False)
            weight = torch.clamp(torch.log1p(mag_mix), 1e-3, 10.0)
            gt_masks = (mags > 0.5 * mag_mix).float()       # [B,N,256,T]
            log_mag = torch.log(mag_mix)                     # detached

        feats = []
        for n in range(N):
            tf = torch.from_numpy(
                np.ascontiguousarray(batch["frames"][:, n, 0]))
            tf = ((tf.float() / 255.0) - mean) / std
            feats.append(torch.relu(tfc(ttrunk(tf.permute(0, 3, 1, 2)))))
        out, _ = tunet(log_mag, feats)
        pred = torch.sigmoid(out)                            # [B,N,256,T]
        # reference BCELoss: mean over sources of mean(w * bce)
        loss = sum(F.binary_cross_entropy(pred[:, n], gt_masks[:, n],
                                          weight=weight[:, 0])
                   for n in range(N)) / N
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
        if i % 20 == 0 or i == 1:
            print(f"iter {i}/{args.iters} loss {float(loss):.4f} "
                  f"({(time.time() - t0) / i:.2f} s/iter)", flush=True)

    os.makedirs(args.out, exist_ok=True)
    tunet.eval(); ttrunk.eval()
    torch.save(tunet.state_dict(),
               os.path.join(args.out, "sound_trained.pth"))
    sd = dict(ttrunk.state_dict())
    sd["fc.weight"] = tfc.weight.data
    sd["fc.bias"] = tfc.bias.data
    torch.save(sd, os.path.join(args.out, "frame_trained.pth"))
    first = float(np.mean(losses[:10]))
    last = float(np.mean(losses[-10:]))
    print(f"saved to {args.out}: loss {first:.4f} -> {last:.4f} "
          f"({args.iters} iters, B={args.batch})")
    if not last < first:
        print("WARNING: loss did not decrease — weights saved anyway")


if __name__ == "__main__":
    main()
