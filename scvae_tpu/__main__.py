"""``python -m scvae_tpu`` entry point (reference ``scvae/__main__.py``)."""

from scvae_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
