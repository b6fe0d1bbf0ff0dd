"""xformers.ops shim."""
import torch


def memory_efficient_attention(q, k, v, attn_bias=None, p=0.0, scale=None,
                               op=None):
    """Exact softmax attention. q/k/v: [B, M, K] (heads folded into B) or
    [B, M, H, K]; returns the same layout as the query."""
    if q.dim() == 4:  # [B, M, H, K] -> fold heads
        b, m, h, d = q.shape
        qf = q.permute(0, 2, 1, 3).reshape(b * h, m, d)
        kf = k.permute(0, 2, 1, 3).reshape(b * h, k.shape[1], d)
        vf = v.permute(0, 2, 1, 3).reshape(b * h, v.shape[1], v.shape[-1])
        out = memory_efficient_attention(qf, kf, vf, attn_bias, p, scale)
        return out.reshape(b, h, m, -1).permute(0, 2, 1, 3)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    attn = q @ k.transpose(-2, -1) * scale
    if attn_bias is not None:
        attn = attn + attn_bias
    attn = attn.softmax(dim=-1)
    if p:
        attn = torch.dropout(attn, p, train=True)
    return attn @ v
