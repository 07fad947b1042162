"""Trajectory plotting -- drop-in equivalents of the reference drawer.

``plot_trajectories`` mirrors ``drawer/plot_results.py`` (initial vs
optimized overlay); ``plot_method4_dashboard`` mirrors
``drawer/plot_method4_results.py`` (multi-panel MCTS dashboard).  Both read
the same ``save/*.txt`` formats, so either system's outputs can be plotted
by either plotter.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from slam_tpu.io.g2o import load_nodes  # noqa: E402


def plot_trajectories(
    initial_path: str | None,
    optimized_path: str | None,
    output: str,
    title: str | None = None,
) -> str:
    """Initial (green) vs optimized (blue) xy overlay
    (``drawer/plot_results.py:34-51``)."""
    plt.figure()
    if initial_path and os.path.exists(initial_path):
        p = load_nodes(initial_path)
        plt.plot(p[:, 0], p[:, 1], "-", label="Original", alpha=0.75,
                 color="green")
    if optimized_path and os.path.exists(optimized_path):
        p = load_nodes(optimized_path)
        plt.plot(p[:, 0], p[:, 1], "-", label="Optimized", alpha=0.75,
                 color="blue")
    plt.axis("equal")
    plt.legend()
    if title:
        plt.title(title)
    plt.savefig(output, dpi=150, bbox_inches="tight")
    plt.close()
    return output


def plot_method4_dashboard(save_path: str, output: str = "method4_comparison.png") -> str:
    """Six-panel MCTS dashboard (``drawer/plot_method4_results.py:45-164``):
    trajectory comparison + visits bar + reward scatters + edge histogram."""
    def load(name):
        p = os.path.join(save_path, name)
        return load_nodes(p) if os.path.exists(p) else None

    init = load("init_nodes.txt")
    best = load("opt_nodes.txt")
    most_visited = load("opt_nodes_most_visited.txt")
    most_edges = load("opt_nodes_most_edges.txt")

    stats_file = os.path.join(save_path, "method4_stats.txt")
    stats = None
    if os.path.exists(stats_file):
        rows = []
        with open(stats_file) as f:
            for line in f:
                if line.startswith("#") or not line.strip():
                    continue
                rows.append(line.split())
        if rows:
            stats = rows

    fig = plt.figure(figsize=(20, 12))
    plt.subplot(2, 3, (1, 4))
    for poses, label, color, alpha in (
        (init, "Initial", "gray", 0.5),
        (best, "Best (Normalized Reward)", "red", 0.9),
        (most_visited, "Most Visited", "blue", 0.7),
        (most_edges, "Most Edges", "green", 0.7),
    ):
        if poses is not None:
            plt.plot(poses[:, 0], poses[:, 1], color=color, lw=2,
                     alpha=alpha, label=label)
    plt.title("METHOD 4: Layer Comparison", fontsize=16)
    plt.xlabel("X (m)")
    plt.ylabel("Y (m)")
    plt.legend()
    plt.grid(True, alpha=0.3)
    plt.axis("equal")

    if stats:
        visits = [int(float(r[1])) for r in stats]
        total_rewards = [float(r[2]) for r in stats]
        normalized = [float(r[4]) for r in stats]
        edge_counts = [int(float(r[5])) for r in stats]

        plt.subplot(2, 3, 2)
        plt.bar(range(len(visits)), visits, alpha=0.7, color="blue")
        plt.title("Layer Visits")
        plt.xlabel("Layer Index")
        plt.ylabel("Visits")
        plt.grid(True, alpha=0.3)

        plt.subplot(2, 3, 3)
        plt.scatter(edge_counts, normalized, s=np.asarray(visits) * 5 + 1,
                    alpha=0.6, c=total_rewards, cmap="viridis")
        plt.xlabel("Total Edges")
        plt.ylabel("Normalized Reward")
        plt.title("Reward vs Edges (size=visits)")
        plt.colorbar(label="Total Reward")
        plt.grid(True, alpha=0.3)

        plt.subplot(2, 3, 5)
        plt.scatter(total_rewards, normalized, s=50, alpha=0.7, color="purple")
        plt.xlabel("Total Reward")
        plt.ylabel("Normalized Reward")
        plt.title("Total vs Normalized Reward")
        plt.grid(True, alpha=0.3)

        plt.subplot(2, 3, 6)
        plt.hist(edge_counts, bins=10, alpha=0.7, color="orange",
                 edgecolor="black")
        plt.xlabel("Edge Count")
        plt.ylabel("Number of Layers")
        plt.title("Edge Count Distribution")
        plt.grid(True, alpha=0.3)

    plt.tight_layout()
    out_path = os.path.join(save_path, output)
    plt.savefig(out_path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return out_path
