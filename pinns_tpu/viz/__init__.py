from pinns_tpu.viz.plots import plot_solution, plot_from_snapshots
from pinns_tpu.viz.animate import animate_snapshots
