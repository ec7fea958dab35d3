"""Independent numpy re-implementation of the reference GPT math, used as the
test oracle for bark_tpu.models.gpt. Written directly from the ggml graph
builders (bark.cpp:1186-1584), NOT from the jax code, so that agreement is
meaningful."""

import numpy as np

EPS = 1e-5


def layer_norm(x, g, b):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + EPS) * g + b


def gelu_tanh(x):
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x**3)))


def softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def causal_forward(params, tokens, n_head, past_k=None, past_v=None, n_past=0):
    """Full causal forward over `tokens` given optional past KV lists.

    params: dict of numpy arrays matching the bark_tpu pytree (unstacked ok).
    Returns (logits_last, new_past_k, new_past_v). past_k[l]: (S, H, hd).
    """
    wte = params["wte"][0]
    D = wte.shape[1]
    L = params["blocks"]["qkv_w"].shape[0]
    H = n_head
    hd = D // H

    T = len(tokens)
    x = wte[tokens] + params["wpe"][n_past : n_past + T]

    new_k, new_v = [], []
    for l in range(L):
        blk = {k: v[l] for k, v in params["blocks"].items()}
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = np.split(qkv, 3, axis=-1)
        k = k.reshape(T, H, hd)
        v = v.reshape(T, H, hd)
        if past_k is not None:
            k_all = np.concatenate([past_k[l], k], axis=0)
            v_all = np.concatenate([past_v[l], v], axis=0)
        else:
            k_all, v_all = k, v
        new_k.append(k_all)
        new_v.append(v_all)
        S = k_all.shape[0]
        q = q.reshape(T, H, hd)
        scores = np.einsum("thd,shd->hts", q, k_all) / np.sqrt(hd)
        # causal mask with offset n_past (ggml_diag_mask_inf_inplace)
        tpos = np.arange(T)[:, None] + n_past
        spos = np.arange(S)[None, :]
        scores = np.where(spos <= tpos, scores, -np.inf)
        att = softmax(scores, axis=-1)
        out = np.einsum("hts,shd->thd", att, v_all).reshape(T, D)
        x = x + out @ blk["proj_w"] + blk["proj_b"]
        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        x = x + gelu_tanh(h @ blk["fc_w"] + blk["fc_b"]) @ blk["out_w"] + blk["out_b"]

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    logits = params["lm_head"][0] @ x[-1]
    return logits, new_k, new_v


def merged_prompt_forward(params, tokens513, n_head):
    """Semantic prefill with merge_ctx: embeds 256+256 rows, adds, appends the
    infer token (bark.cpp:1230-1251), then runs the causal stack."""
    wte = params["wte"][0]
    emb = wte[tokens513[:256]] + wte[tokens513[256:512]]
    emb = np.concatenate([emb, wte[tokens513[512:]]], axis=0)  # (257, D)
    T = emb.shape[0]
    x = emb + params["wpe"][:T]

    D = wte.shape[1]
    H = n_head
    hd = D // H
    L = params["blocks"]["qkv_w"].shape[0]
    new_k, new_v = [], []
    for l in range(L):
        blk = {k: v[l] for k, v in params["blocks"].items()}
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = np.split(qkv, 3, axis=-1)
        k = k.reshape(T, H, hd)
        v = v.reshape(T, H, hd)
        new_k.append(k)
        new_v.append(v)
        q = q.reshape(T, H, hd)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        mask = np.arange(T)[None, :] <= np.arange(T)[:, None]
        scores = np.where(mask, scores, -np.inf)
        att = softmax(scores, axis=-1)
        out = np.einsum("hts,shd->thd", att, v).reshape(T, D)
        x = x + out @ blk["proj_w"] + blk["proj_b"]
        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        x = x + gelu_tanh(h @ blk["fc_w"] + blk["fc_b"]) @ blk["out_w"] + blk["out_b"]

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    return params["lm_head"][0] @ x[-1], new_k, new_v


def fine_forward_ref(params, tokens, codebook_idx, n_head, n_codes_given=1):
    """Non-causal fine forward (bark.cpp:1416-1584). tokens: (T, n_channels)."""
    T = tokens.shape[0]
    D = params["wpe"].shape[1]
    H, hd = n_head, D // n_head
    L = params["blocks"]["qkv_w"].shape[0]

    emb = np.zeros((T, D))
    for i in range(codebook_idx + 1):
        emb += params["wte"][i][tokens[:, i]]
    x = emb + params["wpe"][:T]

    for l in range(L):
        blk = {k: v[l] for k, v in params["blocks"].items()}
        h = layer_norm(x, blk["ln1_g"], blk["ln1_b"])
        qkv = h @ blk["qkv_w"] + blk["qkv_b"]
        q, k, v = np.split(qkv, 3, axis=-1)
        q = q.reshape(T, H, hd)
        k = k.reshape(T, H, hd)
        v = v.reshape(T, H, hd)
        scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        att = softmax(scores, axis=-1)  # NO causal mask
        out = np.einsum("hts,shd->thd", att, v).reshape(T, D)
        x = x + out @ blk["proj_w"] + blk["proj_b"]
        h = layer_norm(x, blk["ln2_g"], blk["ln2_b"])
        x = x + gelu_tanh(h @ blk["fc_w"] + blk["fc_b"]) @ blk["out_w"] + blk["out_b"]

    x = layer_norm(x, params["ln_f_g"], params["ln_f_b"])
    head = params["lm_head"][codebook_idx - n_codes_given]
    return x @ head.T
