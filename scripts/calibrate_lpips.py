"""Print the LPIPS-surrogate calibration table (VERDICT r2 next #6).

Usage: python scripts/calibrate_lpips.py [--wh 96]
Markdown table -> stdout; paste into STATUS.md.
"""

import sys

sys.path.insert(0, "/root/repo")


def main():
    wh = int(sys.argv[sys.argv.index("--wh") + 1]) if "--wh" in sys.argv \
        else 96
    from arnerf_tpu.training.lpips_calibration import DISTORTIONS, calibrate
    c = calibrate(wh=wh)
    print(f"LPIPS-surrogate calibration ({wh}x{wh} procedural render, "
          "deterministic random-feature VGG, seed 0)\n")
    print("| family | strengths | lpips_rand | SSIM | rho(lpips,strength) |")
    print("|---|---|---|---|---|")
    for kind in DISTORTIONS:
        e = c[kind]
        print(f"| {kind} | {e['strengths']} | "
              + "[" + ", ".join(f"{v:.4f}" for v in e["lpips"]) + "] | "
              + "[" + ", ".join(f"{v:.3f}" for v in e["ssim"]) + "] | "
              + f"{e['spearman_lpips_vs_strength']:.2f} |")
    print(f"\ncross-family Spearman lpips_rand vs (1-SSIM): "
          f"{c['cross_family_spearman_lpips_vs_1m_ssim']:.3f}")


if __name__ == "__main__":
    main()
