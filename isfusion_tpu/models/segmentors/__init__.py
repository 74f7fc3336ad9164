from .encoder_decoder import EncoderDecoder3D  # noqa: F401
