from .api import (  # noqa: F401
    MAX_FFT_SIZE_LOG2,
    fft,
    ifft,
    rfft,
    rfft_padded,
    rifft,
    unzip,
    unzip_zero,
    zip_split,
    pack_spectrum,
    unpack_spectrum,
    set_default_backend,
    get_default_backend,
)
from .df64 import (  # noqa: F401 — double-float ~280 dB mode (df64.py)
    fft_df64,
    rfft_df64,
    rifft_df64,
)
