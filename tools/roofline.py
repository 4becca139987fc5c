"""Per-kernel roofline bounds for the fused train-step kernels, derived
from shapes instead of hand arithmetic (round-4 ask: re-derive the bound
table at the shipped configuration, both workload shapes).

For each of the four fused kernels (ops/attention_block.py fwd/bwd,
ops/ffn_block.py fwd/bwd) this computes:

  * MXU bound — FLOPs / peak, with contractions shallower than the
    128-deep MXU derated by 128/depth (a [L,L,64] attention contraction
    runs at half rate);
  * HBM bound — bytes moved (inputs + outputs at their real dtypes) /
    bandwidth;
  * bound ms = max of the two (all four kernels are compute-bound at
    the bench shapes — printed so the claim is checkable).

Config-aware: the FFN backward includes the ``pre`` recompute matmul
when CZT_FFN_SAVE_PRE=0 (the shipped default since round 6).

Optionally merges measured per-call self-times (from
tools/profile_step.py output) and a measured VPU softmax/dropout cost
(from the CZT_ATTN_NO_SOFTMAX / --dropout 0 A/B runs) to print % of
bound with and without the VPU term:

  python tools/roofline.py --batch 128 --seq 136
  python tools/roofline.py --batch 128 --seq 256 \
      --measured attn_fwd=0.97,attn_bwd=2.14,ffn_fwd=1.66,ffn_bwd=3.54 \
      --vpu attn_fwd=0.15,attn_bwd=0.25
"""

from __future__ import annotations

import argparse
import os

V5E_PEAK = 197e12       # bf16 FLOP/s, one v5e chip
V5E_HBM = 819e9         # bytes/s
MXU_DEPTH = 128


def mm(m, n, k, count=1):
    """One [m,k]@[k,n] matmul: (flops, effective_flops) — effective
    inflates shallow contractions by the MXU derate."""
    f = 2.0 * m * n * k * count
    derate = max(1.0, MXU_DEPTH / k)
    return f, f * derate


def kernel_models(B, L, HD, H, F, save_pre: bool):
    """-> {kernel: (flops, effective_flops, hbm_bytes)}. L is the padded
    sequence length per call; B the microbatch."""
    Dh = HD // H
    bf2 = 2  # bf16 bytes
    out = {}

    # ---- attention block fwd: QK^T, PV (per head), ctx@Wo ----
    fl, ef = 0.0, 0.0
    for m, n, k, c in ((L, L, Dh, B * H),      # scores
                       (L, Dh, L, B * H),      # PV
                       (L, HD, HD, B)):        # out-proj
        f, e = mm(m, n, k, c)
        fl += f
        ef += e
    # q,k,v,x in + y,ctx out (bf16) + stats (f32, tiny)
    hbm = (4 * B * L * HD + 2 * B * L * HD) * bf2 + B * (H + 2) * L * 4
    out["attn_fwd"] = (fl, ef, hbm)

    # ---- attention block bwd: recompute scores + 5 attention mms +
    #      3 out-proj-side mms ----
    fl, ef = 0.0, 0.0
    for m, n, k, c in ((L, L, Dh, B * H),      # scores recompute
                       (L, Dh, L, B * H),      # dv = p^T @ do
                       (L, L, Dh, B * H),      # dp = do @ v^T
                       (L, Dh, L, B * H),      # dq = ds @ k
                       (L, Dh, L, B * H),      # dk = ds^T @ q
                       (L, HD, HD, B),         # z recompute ctx@Wo
                       (HD, HD, L, B),         # dWo = ctx^T @ dattn
                       (L, HD, HD, B)):        # dctx = dattn @ Wo^T
        f, e = mm(m, n, k, c)
        fl += f
        ef += e
    hbm = (7 * B * L * HD) * bf2 + B * (H + 2) * L * 4  # q,k,v,x,ctx,dy in
    out["attn_bwd"] = (fl, ef, hbm)                     # + dq,dk,dv,dx out

    # ---- FFN block fwd: mm1 + mm2 (full-depth) ----
    f1, e1 = mm(B * L, F, HD)
    f2, e2 = mm(B * L, HD, F)
    hbm = (2 * B * L * HD) * bf2 + (B * L * F * bf2 if save_pre else 0) \
        + B * 2 * L * 4
    out["ffn_fwd"] = (f1 + f2, e1 + e2, hbm)

    # ---- FFN block bwd: dx2, dW2, dx1, dW1 (+ pre recompute) ----
    fl, ef = 0.0, 0.0
    for m, n, k in ((B * L, F, HD),    # da = dout @ W2^T
                    (F, HD, B * L),    # dW2
                    (B * L, HD, F),    # dx = dpre @ W1^T
                    (HD, F, B * L)):   # dW1
        f, e = mm(m, n, k)
        fl += f
        ef += e
    if not save_pre:
        f, e = mm(B * L, F, HD)        # pre recompute
        fl += f
        ef += e
    hbm = (3 * B * L * HD) * bf2 \
        + (B * L * F * bf2 if save_pre else 0) + B * 2 * L * 4
    out["ffn_bwd"] = (fl, ef, hbm)
    return out


def parse_kv(s):
    if not s:
        return {}
    return {k: float(v) for k, v in
            (item.split("=") for item in s.split(","))}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--seq", type=int, default=136,
                   help="logical seq; padded internally like the kernels")
    p.add_argument("--hidden", type=int, default=768)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--ffn_dim", type=int, default=3072)
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--accum", type=int, default=16)
    p.add_argument("--measured", default="",
                   help="kernel=ms per call, from tools/profile_step.py")
    p.add_argument("--vpu", default="",
                   help="kernel=ms measured VPU cost per call (softmax "
                        "A/B + dropout A/B deltas)")
    args = p.parse_args()

    # K/V pad to the 128-lane multiple; Q rows to 8 (attention_block.py);
    # at seq 136 the scores' lane dim is 256 -> use the padded Lk for
    # attention flops, the 8-padded Lq elsewhere
    Lq = -(-args.seq // 8) * 8
    Lk = -(-args.seq // 128) * 128
    save_pre = os.environ.get("CZT_FFN_SAVE_PRE", "0") == "1"

    # attention kernels see [Lq x Lk] scores: model with L=geometric
    # mean is wrong — compute attention mms with (Lq, Lk) explicitly by
    # passing L=Lq and scaling score-shaped mms by Lk/Lq where needed.
    # Simpler: build with exact dims here.
    B, HD, H, F = args.batch, args.hidden, args.heads, args.ffn_dim
    Dh = HD // H

    def bounds(fl, ef, hbm):
        return ef / V5E_PEAK * 1e3, hbm / V5E_HBM * 1e3

    models = {}
    # attn fwd
    fl = ef = 0.0
    for m, n, k, c in ((Lq, Lk, Dh, B * H), (Lq, Dh, Lk, B * H),
                       (Lq, HD, HD, B)):
        f, e = mm(m, n, k, c)
        fl += f
        ef += e
    hbm = (2 * B * Lq * HD + 2 * B * Lk * HD + 2 * B * Lq * HD) * 2 \
        + B * (H + 2) * max(Lq, 128) * 4
    models["attn_fwd"] = (fl, ef, hbm)
    fl = ef = 0.0
    for m, n, k, c in ((Lq, Lk, Dh, B * H), (Lk, Dh, Lq, B * H),
                       (Lq, Lk, Dh, B * H), (Lq, Dh, Lk, B * H),
                       (Lk, Dh, Lq, B * H), (Lq, HD, HD, B),
                       (HD, HD, Lq, B), (Lq, HD, HD, B)):
        f, e = mm(m, n, k, c)
        fl += f
        ef += e
    hbm = (5 * B * Lq * HD + 2 * B * Lk * HD + 2 * B * Lk * HD) * 2 \
        + B * (H + 2) * max(Lq, 128) * 4
    models["attn_bwd"] = (fl, ef, hbm)
    ffn = kernel_models(B, Lq, HD, H, F, save_pre)
    models["ffn_fwd"] = ffn["ffn_fwd"]
    models["ffn_bwd"] = ffn["ffn_bwd"]

    measured = parse_kv(args.measured)
    vpu = parse_kv(args.vpu)
    calls = args.layers * args.accum
    print(f"shape B={B} Lq={Lq} Lk={Lk} HD={HD} H={H} F={F} "
          f"save_pre={save_pre}; {calls} calls/kernel/step "
          f"(x2 for the two encoders' fwd kernels)")
    print(f"{'kernel':9s} {'GFLOP':>8s} {'eff-GF':>8s} {'MXU ms':>7s} "
          f"{'HBM ms':>7s} {'bound':>7s} {'+VPU':>6s} {'meas':>7s} "
          f"{'%bound':>7s} {'%+VPU':>7s}")
    for name, (fl, ef, hbm) in models.items():
        mxu_ms, hbm_ms = bounds(fl, ef, hbm)
        bound = max(mxu_ms, hbm_ms)
        v = vpu.get(name, 0.0)
        msd = measured.get(name)
        pct = f"{100 * bound / msd:6.1f}%" if msd else "      -"
        pctv = (f"{100 * (bound + v) / msd:6.1f}%" if msd and v
                else "      -")
        print(f"{name:9s} {fl / 1e9:8.1f} {ef / 1e9:8.1f} {mxu_ms:7.3f} "
              f"{hbm_ms:7.3f} {bound:7.3f} {v:6.2f} "
              f"{msd if msd else 0:7.3f} {pct} {pctv}")


if __name__ == "__main__":
    main()
