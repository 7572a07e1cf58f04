"""Attic: superseded backend generations, kept for provenance.

packet_backend (gen 2) and bvh_backend "lane" (gen 1) are fully
superseded by wide (portable XLA twin) and the Mosaic v7/v8/v9 kernels —
every megakernel interface change was costing six backend updates
(VERDICT r3 weak #7).  They are NOT in the production registry
(render/backends.py raises for "packet"/"lane"); the lane traversal is
still imported by render/diagnostics.py as the skip-link cap-detection
reference, and tests/test_attic.py keeps its brute-force equality
coverage alive because no survivor consumes ops/bvh's skip links.
"""
