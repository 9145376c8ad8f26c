from .audio_file import (  # noqa: F401
    BaseAudioFile,
    Endianness,
    Error,
    FileType,
    IAudioFile,
    NumberFormat,
    OAudioFile,
    PCMFormat,
    double_to_extended,
    extended_to_double,
    extract_errors_from_flags,
    find_bit_depth,
    find_number_format,
    get_error_string,
)
from .streaming import AudioBlockReader  # noqa: F401
