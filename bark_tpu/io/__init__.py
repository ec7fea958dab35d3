from bark_tpu.io.ggml import (  # noqa: F401
    GGML_MAGIC,
    GGMLType,
    GGMLFType,
    GPTHParams,
    CodecHParams,
    TensorRecord,
    ModelFile,
    read_model_file,
    write_model_file,
)
from bark_tpu.io.quant import quantize_blocks, dequantize_blocks  # noqa: F401
