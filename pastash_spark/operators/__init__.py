"""DataFrame -> DataFrame operators mirroring the reference filter inventory
(SURVEY.md §2).  Each operator is a plain function: compose them in order to
build the same ordered filter chain the reference config describes — but as
one lazy Catalyst plan, so consecutive narrow ops fuse into a single
whole-stage-codegen pass instead of N per-event callbacks.
"""
