from unetdc_tpu.pipelines.engine import QuantifyEngine  # noqa: F401
