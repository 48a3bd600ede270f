"""Pure transform kernels (no Ray imports).

Each kernel reimplements, from published behavior, one deterministic
operator of the reference (file:line cites in each module). These are the
per-turn-equality surface: given the same inputs they must produce
byte-identical outputs to the reference's pure functions.
"""
