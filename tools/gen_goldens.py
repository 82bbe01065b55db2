"""Generate golden PNGs for the image-regression lock
(tests/test_golden_images.py).  Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_goldens.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from golden_utils import CONFIGS, GOLDEN_DIR, render_config
    from granite_tpu.utils.image_io import save_png
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, cfg in CONFIGS.items():
        img = render_config(cfg)
        path = os.path.join(GOLDEN_DIR, f"{name}.png")
        save_png(path, img)
        print("wrote", path, img.shape)


if __name__ == "__main__":
    main()
