"""Pure per-batch / per-value functions: tokenizer, hashing, posting
codec, CHASM bytecode, text statistics.  No Ray dependencies here —
these are the kernels the Ray Data stages call."""
