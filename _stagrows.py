import numpy as np
from dagnn_tpu.dag.batch import PadConfig
from dagnn_tpu.data.synthetic import synthetic_ast_batch
graphs = synthetic_ast_batch(0, 160, mean_nodes=125)
n = sum(g.num_nodes for g in graphs)
for chunk, eb in ((256, 384), (256, 0), (512, 768), (128, 192)):
    for st in (0, 1):
        pad = PadConfig.for_graphs(graphs, chunk_size=chunk, edge_budget=eb, stagger=st)
        slots = pad.max_levels * chunk
        print(f"chunk={chunk} eb={eb} stagger={st}: rows={pad.max_levels} ke={pad.edges_per_level} kt={pad.tgrad_per_level} occupancy={n/slots:.2f}")
