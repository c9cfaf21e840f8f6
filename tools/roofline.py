"""Speed-of-light accounting for the per-frame stages (ROOFLINE.md).

Two ceilings apply on a v5e chip:
  * HBM bandwidth (~819 GB/s): dense/streaming stages (strips build,
    integration's [budget, 512] pool rows, preprocess).
  * The serial gather law (CLAUDE.md, trace-measured): gathered ROWS
    cost ~3.4-4.6 ns each for 8-16-wide rows, ~7 ns for narrow rows,
    regardless of bandwidth — gather-bound stages hit this long before
    HBM. Scatters cost ~6-8 ns per update.

This tool computes, per stage at the bench config, the bytes touched,
the gather/scatter row counts, and the resulting model time; pass
measured per-stage ms (tools/profile_r4.py) via --measured
'stage=ms,...' to print the gap factors. The table is the basis of
ROOFLINE.md; the reference analogue of this regime is the per-kernel
TICK/TOCK accounting (se_shared/timings.h:7-15).
"""

import argparse

HBM_GBPS = 819.0          # v5e HBM bandwidth
ROW8 = 3.4e-9             # gather law: 8-wide f32 row
ROW16 = 4.6e-9            # 16-wide row
ROW1 = 7.0e-9             # narrow row (single element)
SCATTER = 7.0e-9          # per update
TOPK_262K = 0.22e-3       # measured top_k over a dense grid


def model(w=320, h=240, size=512, blocks=7300, budget=8192,
          iters=(10, 5, 4), cascade=((3, 1.0), (3, 0.55), (6, 0.18),
                                     (16, 1 / 24.0), (36, 1 / 64.0))):
    n = w * h
    b3 = (size // 8) ** 3
    st = {}

    # preprocess: pyramid + vertex/normal — pure streaming
    bytes_pp = n * 4 * (1 + 3 + 3 + 1 + 2 * (1 + 3 + 3 + 1) // 4)
    st["preprocess"] = {"bytes": bytes_pp, "rows": 0, "scat": 0}

    # tracking: per GN iteration one 8-wide ref row per pixel of the
    # level + residual math; reduction is fused
    rows_tr = sum(it * (n >> (2 * lv)) for lv, it in enumerate(iters))
    st["tracking"] = {"bytes": rows_tr * 32 * 2, "rows": rows_tr,
                      "rowcost": ROW8, "scat": 0}

    # allocation: band sampling (2 probes/px), dense touched grid,
    # top_k compaction + bounded scatters
    st["allocation"] = {"bytes": b3 * 4 * 2, "rows": 2 * n,
                        "rowcost": ROW1, "scat": 8192,
                        "extra": TOPK_262K}

    # integration block pass: stream budget*512 voxels x 2ch read+write
    # + depth patch rows (32/block) + worklist scatters
    bytes_ig = budget * 512 * 4 * 2 * 2
    st["integrate-blocks"] = {"bytes": bytes_ig,
                              "rows": budget * 32 + budget,
                              "rowcost": ROW16, "scat": 2 * budget}

    # integration node pass (dense): depth row gather per octant at
    # every level + dense mip stream
    cells = sum((size // 8 >> lv) ** 3 for lv in range(10)
                if (size // 8 >> lv) >= 1)
    st["integrate-mips"] = {"bytes": cells * 4 * 4, "rows": cells,
                            "rowcost": ROW8, "scat": 0}

    # strips build: stream pool rows -> bf16 table (+ nslot gather)
    bytes_st = budget * 512 * (4 * 2 + 2 * 2) + budget * 4
    st["strips-build"] = {"bytes": bytes_st, "rows": budget,
                          "rowcost": ROW1, "scat": 0}

    # nav build: block-distance dilations (dense, 5 passes) + nav4
    st["nav-build"] = {"bytes": b3 * 4 * (2 * 5 + 4 + 1), "rows": 0,
                       "scat": 0}

    # march: per probe one nav4 row (16B) + one strip row (32B)
    probes = sum(s * max(1024 / n, f) for s, f in cascade) * n
    st["march"] = {"bytes": probes * 48, "rows": 2 * probes,
                   "rowcost": ROW16, "scat": 0}

    # refinement: nav4 row + 4 strip rows per ray
    st["refinement"] = {"bytes": n * (16 + 4 * 32), "rows": 5 * n,
                        "rowcost": ROW16, "scat": 0}

    for name, s in st.items():
        t_bw = s["bytes"] / (HBM_GBPS * 1e9)
        t_rows = s["rows"] * s.get("rowcost", ROW8)
        t_scat = s.get("scat", 0) * SCATTER
        s["model_ms"] = (max(t_bw, t_rows + t_scat)
                         + s.get("extra", 0.0)) * 1e3
        s["bw_ms"] = t_bw * 1e3
        s["gather_ms"] = (t_rows + t_scat) * 1e3
    return st


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measured", default="",
                    help="stage=ms,stage=ms (from tools/profile_r4.py)")
    ap.add_argument("--blocks", type=int, default=7300)
    ap.add_argument("--budget", type=int, default=8192)
    args = ap.parse_args()
    meas = {}
    for part in args.measured.split(","):
        if "=" in part:
            k, v = part.split("=")
            meas[k.strip()] = float(v)
    st = model(blocks=args.blocks, budget=args.budget)
    print(f"| stage | bytes touched | gather rows | BW-bound ms | "
          f"gather-law ms | model ms | measured ms | gap |")
    print("|---|---|---|---|---|---|---|---|")
    tot_model = 0.0
    for name, s in st.items():
        m = meas.get(name)
        gap = f"{m / s['model_ms']:.1f}x" if m else "-"
        mm = f"{m:.2f}" if m else "-"
        tot_model += s["model_ms"]
        print(f"| {name} | {s['bytes']/1e6:.1f} MB | {s['rows']/1e3:.0f}k "
              f"| {s['bw_ms']:.2f} | {s['gather_ms']:.2f} | "
              f"{s['model_ms']:.2f} | {mm} | {gap} |")
    print(f"\nmodel total: {tot_model:.2f} ms "
          f"({1000.0/tot_model:.1f} fps speed-of-light)")


if __name__ == "__main__":
    main()
