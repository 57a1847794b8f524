from tts_tpu.models.registry import register_loader, runner_from_file  # noqa: F401
