"""Minimal torch replicas of the reference models, used ONLY as parity
oracles in tests (VERDICT round-1 item 1).

Each module reproduces the reference's forward math and state-dict key
layout exactly (citations inline), written compactly from the documented
semantics — dropped: registries, init helpers, hooks, pretrained loading.
Random-init state dicts from these models are saved as ``.pth`` files,
loaded through ``segdistill_tpu.convert.torch_loader``, and the two
frameworks' logits / training trajectories are compared.
"""
