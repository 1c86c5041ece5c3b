from unetdc_tpu.io.native import (  # noqa: F401
    decode_rgb,
    encode_png_gray,
    encode_png_rgb,
    native_available,
)
