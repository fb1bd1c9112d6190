"""Analytic roofline decomposition for the bf16 ResNet-50 embedding
path (the `--fused off` parity-grade bench path) on TPU v5e.

VERDICT r2 item 4 asked either to move the bf16 path past 15k f/s or
to show each stage is at its bandwidth bound at batch-optimal
settings.  This script computes, per stage, the HBM-traffic floor and
the MXU-compute floor implied by the published v5e ceilings
(197 bf16 TFLOP/s, 819 GB/s HBM), under the generous fusion model
"XLA fuses everything inside a conv + the trailing elementwise chain,
so each tensor crosses HBM once per producer and once per consumer".
The sum of per-stage max(compute, bandwidth) floors is the best any
compiler or kernel could do without changing the arithmetic (i.e.
without quantizing — which is exactly what the int8 path does).

Pipeline modeled (reference src/embeddings.py:80-85 preprocessing,
torchvision resnet50 with fc=Identity — our models/resnet.py): uint8
64px frames -> bilinear resize 256 + center-crop 224 (matmul form,
crop folded) -> normalize -> conv stack, BN folded into convs
(frozen-eval mode), bf16 activations/weights.

Run: python scripts/roofline_rn50.py [--batch 256]
"""

import argparse

V5E_BF16_FLOPS = 197e12        # MXU peak, bf16 with f32 accumulation
V5E_HBM_BPS = 819e9            # HBM bandwidth
BYTES = 2                      # bf16


def conv(cin, cout, k, hw_out, stride=1):
    """(flops_per_frame, out_elems_per_frame) for a kxk conv."""
    flops = 2 * cin * cout * k * k * hw_out * hw_out
    return flops, hw_out * hw_out * cout


def bottleneck(hw, cin, cmid, cout, stride=1):
    """Bottleneck block traffic/FLOPs per frame.

    Traffic model: read block input once (shared by conv1 and the
    skip), each intermediate written+read once, output written once;
    the residual add and ReLUs fuse into the producing convs.  A
    projection shortcut (cin != cout or stride > 1) adds its own
    weight-read + output write, fused with the add.
    """
    hw_in = hw * stride
    f1, e1 = conv(cin, cmid, 1, hw)          # 1x1 reduce (stride folded)
    f2, e2 = conv(cmid, cmid, 3, hw)         # 3x3
    f3, e3 = conv(cmid, cout, 1, hw)         # 1x1 expand
    flops = f1 + f2 + f3
    elems_in = hw_in * hw_in * cin
    traffic = (elems_in                      # read input (conv1 + skip share)
               + 2 * e1 + 2 * e2             # intermediates w+r
               + e3)                         # output write
    params = cin * cmid + 9 * cmid * cmid + cmid * cout
    if cin != cout or stride > 1:
        fp, ep = conv(cin, cout, 1, hw)
        flops += fp
        traffic += ep                        # projection output (extra read
        params += cin * cout                 # of input already counted)
    return flops, traffic * BYTES, params * BYTES


def stage(name, blocks):
    flops = sum(b[0] for b in blocks)
    act = sum(b[1] for b in blocks)
    params = sum(b[2] for b in blocks)
    return name, flops, act, params


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=256)
    parser.add_argument("--measured_ms", type=float, default=21.0,
                        help="Measured full-net time at this batch "
                             "(docs/DESIGN.md roofline table).")
    args = parser.parse_args()
    n = args.batch

    stages = []

    # Preprocess: resize 64->256 as two interp matmuls with the 224
    # crop folded (rows selected), then normalize fused into the stem.
    # Traffic: read uint8 64px, write bf16 224px (intermediate 224x64
    # row-resized tensor w+r).
    pre_traffic = (64 * 64 * 3 * 1                    # uint8 in
                   + 2 * 224 * 64 * 3 * BYTES        # row-resize temp w+r
                   + 224 * 224 * 3 * BYTES)          # bf16 out
    pre_flops = 2 * (224 * 64 * 3 * 64 + 224 * 224 * 3 * 64)
    stages.append(("preprocess", pre_flops, pre_traffic, 0))

    # Stem: conv7x7 s2 3->64 @112, fused BN/ReLU; maxpool3x3 s2 @56.
    f, e = conv(3, 64, 7, 112)
    stem_traffic = (224 * 224 * 3 + 2 * e) * BYTES   # in r, out w+r (pool)
    pool_out = 56 * 56 * 64
    stem_traffic += pool_out * BYTES                 # pool out w
    stages.append(("stem+pool", f, stem_traffic, 7 * 7 * 3 * 64 * BYTES))

    stages.append(stage("layer1 (3x @56, 64/256)", [
        bottleneck(56, 64, 64, 256),
        bottleneck(56, 256, 64, 256),
        bottleneck(56, 256, 64, 256)]))
    stages.append(stage("layer2 (4x @28, 128/512)", [
        bottleneck(28, 256, 128, 512, stride=2),
        bottleneck(28, 512, 128, 512),
        bottleneck(28, 512, 128, 512),
        bottleneck(28, 512, 128, 512)]))
    stages.append(stage("layer3 (6x @14, 256/1024)", [
        bottleneck(14, 512, 256, 1024, stride=2)] + [
        bottleneck(14, 1024, 256, 1024) for _ in range(5)]))
    stages.append(stage("layer4 (3x @7, 512/2048)", [
        bottleneck(7, 1024, 512, 2048, stride=2),
        bottleneck(7, 2048, 512, 2048),
        bottleneck(7, 2048, 512, 2048)]))
    # Global avgpool + f32 output fetch (2048-d embedding).
    stages.append(("avgpool+out", 7 * 7 * 2048,
                   (7 * 7 * 2048 + 2 * 2048) * BYTES, 0))

    print(f"ResNet-50 bf16 @224, batch {n}, v5e "
          f"({V5E_BF16_FLOPS/1e12:.0f} TFLOP/s, {V5E_HBM_BPS/1e9:.0f} GB/s)")
    print(f"{'stage':26} {'GFLOP':>7} {'act MB':>7} {'w MB':>6} "
          f"{'t_comp':>7} {'t_bw':>7} {'floor':>7}")
    tot_f = tot_b = tot_floor = 0.0
    for name, flops, act, params in stages:
        fb, ab = flops * n, act * n + params     # weights read once/batch
        t_c = fb / V5E_BF16_FLOPS * 1e3
        t_b = ab / V5E_HBM_BPS * 1e3
        floor = max(t_c, t_b)
        tot_f += fb
        tot_b += ab
        tot_floor += floor
        print(f"{name:26} {fb/1e9:7.0f} {act*n/1e6:7.1f} {params/1e6:6.1f} "
              f"{t_c:6.2f}m {t_b:6.2f}m {floor:6.2f}m")
    t_c = tot_f / V5E_BF16_FLOPS * 1e3
    t_b = tot_b / V5E_HBM_BPS * 1e3
    print(f"{'TOTAL':26} {tot_f/1e9:7.0f} {tot_b/1e6:7.1f} {'':6} "
          f"{t_c:6.2f}m {t_b:6.2f}m {tot_floor:6.2f}m")
    floor_fps = n / (tot_floor / 1e3)
    meas_fps = n / (args.measured_ms / 1e3)
    print(f"\nper-stage-floor throughput ceiling: {floor_fps:,.0f} f/s")
    print(f"measured ({args.measured_ms} ms): {meas_fps:,.0f} f/s "
          f"= {meas_fps / floor_fps:.0%} of the mixed roofline")
    print(f"pure-compute ceiling (100% MFU): "
          f"{n / (t_c / 1e3):,.0f} f/s — unreachable: "
          f"{tot_b/1e9:.1f} GB/batch of activation traffic at "
          f"{V5E_HBM_BPS/1e9:.0f} GB/s costs {t_b:.1f} ms alone")


if __name__ == "__main__":
    main()
