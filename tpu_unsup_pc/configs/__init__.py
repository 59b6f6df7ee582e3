from tpu_unsup_pc.configs import presets  # noqa: F401
