from bark_tpu.text.tokenizer import (  # noqa: F401
    Vocab,
    strip_accents,
    bert_tokenize,
    tokenize_input,
)
