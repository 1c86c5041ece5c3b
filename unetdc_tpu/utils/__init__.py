from unetdc_tpu.utils.profiling import stage_timer, profile_trace  # noqa: F401
