"""Stage ops (SURVEY.md L1/L2): batched, statically-shaped jit functions.

Every op follows the padding contract (SURVEY.md §7 hard part 2): inputs and
outputs are fixed-capacity arrays plus boolean masks; capacities come from
config, so jit specializes per config and never recompiles on data.
"""
