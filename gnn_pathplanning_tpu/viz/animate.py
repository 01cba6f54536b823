"""Rollout animation and path-comparison figures.

Capability parity with the reference visualization stack
(/root/reference/utils/visualize.py — map/agents/goals animation with K-hop
communication links read from the saved GSO; utils/multipathvisualizerCombine.py
``DrawpathCombine`` — predicted-vs-target path overlays). Consumes the same
artifacts: case YAML (map + agents), schedule YAML (statistics + schedule),
and the per-step GSO sequence; also accepts in-memory arrays from the batched
simulator directly (no file round-trip needed in-process).

matplotlib imports are deferred so headless/dataset-only installs never pay
for them.
"""
from __future__ import annotations

from pathlib import Path

import numpy as np


# ------------------------------------------------------------- YAML loaders
def load_case_yaml(path: str | Path) -> dict:
    """Parse the input-case YAML contract into {grid, starts, goals, names}.
    Hand-rolled for the fixed schema (same as native/src/mapf.hpp)."""
    import re
    dims = None
    obstacles, names, starts, goals = [], [], [], []
    section = None
    pair = re.compile(r"\[\s*(-?\d+)\s*,\s*(-?\d+)\s*\]")
    with open(path) as f:
        for line in f:
            if "dimensions:" in line:
                m = pair.search(line)
                dims = (int(m.group(1)), int(m.group(2)))
            elif "obstacles:" in line:
                section = "obs"
            elif "agents:" in line:
                section = "agents"
            elif section == "obs" and line.strip().startswith("-"):
                m = pair.search(line)
                if m:
                    obstacles.append((int(m.group(1)), int(m.group(2))))
            elif section == "agents":
                if "name:" in line:
                    names.append(line.split("name:")[1].strip())
                elif "start:" in line:
                    m = pair.search(line)
                    starts.append((int(m.group(1)), int(m.group(2))))
                elif "goal:" in line:
                    m = pair.search(line)
                    goals.append((int(m.group(1)), int(m.group(2))))
    grid = np.zeros(dims, np.float32)
    for x, y in obstacles:
        if 0 <= x < dims[0] and 0 <= y < dims[1]:
            grid[x, y] = 1.0
    return {"grid": grid, "starts": np.array(starts, np.int32),
            "goals": np.array(goals, np.int32), "names": names}


def load_schedule_yaml(path: str | Path) -> np.ndarray:
    """Parse an output-schedule YAML into dense [T+1, N, 2] positions."""
    agents: dict[str, list[tuple[int, int, int]]] = {}
    current = None
    x = y = None
    with open(path) as f:
        for line in f:
            ls = line.strip()
            if ls.endswith(":") and not ls.startswith(("statistics", "schedule")) \
                    and ":" in ls and not ls.startswith("-"):
                current = agents.setdefault(ls[:-1], [])
            elif ls.startswith("- x:"):
                x = int(float(ls.split(":")[1]))
            elif ls.startswith("y:"):
                y = int(float(ls.split(":")[1]))
            elif ls.startswith("t:"):
                t = int(float(ls.split(":")[1]))
                if current is not None:
                    current.append((t, x, y))
    # Preserve the file's agent order (the reference keeps insertion
    # order; digit-sorting scrambled non-"agent{i}" names).
    names = list(agents)
    t_max = max(max(t for t, _, _ in agents[n]) for n in names) + 1
    out = np.zeros((t_max, len(names), 2), np.int32)
    for i, name in enumerate(names):
        steps = sorted(agents[name])
        last = steps[0][1:]
        for t in range(t_max):
            match = [s for s in steps if s[0] == t]
            if match:
                last = match[0][1:]
            out[t, i] = last
    return out


def comm_links_k_hops(gso: np.ndarray, agent: int, k: int) -> list[tuple[int, int]]:
    """Edges reachable from `agent` within k hops (the reference's BFS over
    the GSO for drawing communication links, visualize.py:156-227)."""
    n = gso.shape[0]
    adj = (np.abs(gso) > 1e-9)
    frontier = {agent}
    seen = {agent}
    edges = []
    for _ in range(k):
        nxt = set()
        for a in frontier:
            for b in range(n):
                if adj[a, b] and (a, b) not in edges and (b, a) not in edges:
                    edges.append((a, b))
                if adj[a, b] and b not in seen:
                    nxt.add(b)
        seen |= nxt
        frontier = nxt
    return edges


# ----------------------------------------------------------------- figures
class Animation:
    """Matplotlib rollout animation with optional K-hop comm links."""

    def __init__(self, grid: np.ndarray, goals: np.ndarray,
                 schedule: np.ndarray, gso_seq: np.ndarray | None = None,
                 k_hops: int = 3, chosen_agent: int | None = None):
        self.grid = np.asarray(grid)
        self.goals = np.asarray(goals)
        self.schedule = np.asarray(schedule)   # [T+1, N, 2]
        self.gso_seq = gso_seq
        self.k_hops = k_hops
        self.chosen_agent = chosen_agent

    def render(self, out_path: str | Path, fps: int = 10) -> Path:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.animation as manim
        import matplotlib.pyplot as plt

        t_max, n, _ = self.schedule.shape
        w, h = self.grid.shape
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.set_xlim(-0.5, h - 0.5)
        ax.set_ylim(w - 0.5, -0.5)
        ax.set_aspect("equal")
        for x, y in np.argwhere(self.grid > 0):
            ax.add_patch(plt.Rectangle((y - 0.5, x - 0.5), 1, 1, color="0.3"))
        cmap = plt.colormaps.get_cmap("hsv")
        colors = [cmap(i / max(n, 1)) for i in range(n)]
        for i, (gx, gy) in enumerate(self.goals):
            ax.add_patch(plt.Rectangle((gy - 0.3, gx - 0.3), 0.6, 0.6,
                                       color=colors[i], alpha=0.3))
        dots = [ax.add_patch(plt.Circle((0, 0), 0.3, color=colors[i]))
                for i in range(n)]
        lines = []

        def update(t):
            for line in lines:
                line.remove()
            lines.clear()
            pos = self.schedule[min(t, t_max - 1)]
            for i, d in enumerate(dots):
                d.center = (pos[i, 1], pos[i, 0])
            if self.gso_seq is not None and self.chosen_agent is not None \
                    and t < len(self.gso_seq):
                for a, b in comm_links_k_hops(self.gso_seq[t],
                                              self.chosen_agent, self.k_hops):
                    ln, = ax.plot([pos[a, 1], pos[b, 1]],
                                  [pos[a, 0], pos[b, 0]],
                                  color="0.6", lw=0.8, zorder=0)
                    lines.append(ln)
            ax.set_title(f"t = {min(t, t_max - 1)}")
            return dots

        anim = manim.FuncAnimation(fig, update, frames=t_max + 5,
                                   interval=1000 // fps)
        out_path = Path(out_path)
        if out_path.suffix == ".gif":
            anim.save(out_path, writer=manim.PillowWriter(fps=fps))
        else:
            anim.save(out_path, writer=manim.FFMpegWriter(fps=fps))
        plt.close(fig)
        return out_path


def draw_paths_figure(grid: np.ndarray, predicted: np.ndarray,
                      target: np.ndarray, out_path: str | Path) -> Path:
    """Predicted-vs-target path overlay (DrawpathCombine capability)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = predicted.shape[1]
    fig, axes = plt.subplots(1, 2, figsize=(12, 6))
    for ax, sched, title in ((axes[0], predicted, "predicted"),
                             (axes[1], target, "expert target")):
        w, h = grid.shape
        ax.set_xlim(-0.5, h - 0.5)
        ax.set_ylim(w - 0.5, -0.5)
        ax.set_aspect("equal")
        ax.set_title(title)
        for x, y in np.argwhere(grid > 0):
            ax.add_patch(plt.Rectangle((y - 0.5, x - 0.5), 1, 1, color="0.3"))
        cmap = plt.colormaps.get_cmap("hsv")
        for i in range(n):
            c = cmap(i / max(n, 1))
            ax.plot(sched[:, i, 1], sched[:, i, 0], "-o", color=c,
                    ms=3, lw=1.2)
            ax.plot(sched[0, i, 1], sched[0, i, 0], "s", color=c, ms=8)
            ax.plot(sched[-1, i, 1], sched[-1, i, 0], "*", color=c, ms=12)
    out_path = Path(out_path)
    fig.savefig(out_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return out_path


def render_result_dir(result_dir: str | Path, out_dir: str | Path,
                      k_hops: int = 3, chosen_agent: int | None = 0,
                      fps: int = 10, limit: int | None = None) -> list[Path]:
    """Batch movie generation over a rollout-artifact directory (the
    capability of the reference's gen_movie*.py drivers): expects the
    ``input/ predict/ GSO/`` layout written by env.export.save_rollout_case
    and renders one animation per case."""
    result_dir = Path(result_dir)
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    outputs = []
    cases = sorted((result_dir / "input").glob("*.yaml"))
    if limit is not None:
        cases = cases[:limit]
    for case_path in cases:
        stem = case_path.stem
        sched_path = result_dir / "predict" / f"{stem}.yaml"
        if not sched_path.exists():
            continue
        case = load_case_yaml(case_path)
        schedule = load_schedule_yaml(sched_path)
        gso_seq = None
        gso_path = result_dir / "GSO" / f"{stem}.npz"
        if gso_path.exists():
            with np.load(gso_path) as z:
                gso_seq = z["gso"].reshape(-1, *z["gso"].shape[-2:])
        anim = Animation(case["grid"], case["goals"], schedule, gso_seq,
                         k_hops=k_hops, chosen_agent=chosen_agent)
        outputs.append(anim.render(out_dir / f"{stem}.gif", fps=fps))
    return outputs


def main(argv=None):
    """CLI mirroring the reference visualizer
    (utils/visualize.py:305-313): --map case.yaml --schedule sol.yaml
    [--GSO gso.npz] [--nGraphFilterTaps K] [--id_chosenAgent A]
    [--video out.mp4|gif] [--speed fps]."""
    import argparse
    p = argparse.ArgumentParser(description="MAPF rollout animation")
    p.add_argument("--map", required=True, help="input case YAML")
    p.add_argument("--schedule", required=True, help="schedule YAML")
    p.add_argument("--GSO", default=None, help="GSO .npz (key 'gso')")
    p.add_argument("--nGraphFilterTaps", type=int, default=3)
    p.add_argument("--id_chosenAgent", type=int, default=None)
    p.add_argument("--video", default="rollout.gif")
    p.add_argument("--speed", type=int, default=10)
    args = p.parse_args(argv)

    case = load_case_yaml(args.map)
    schedule = load_schedule_yaml(args.schedule)
    gso_seq = None
    if args.GSO:
        if str(args.GSO).endswith(".mat"):
            import scipy.io as sio
            gso_seq = np.asarray(sio.loadmat(args.GSO)["gso"])
        else:
            with np.load(args.GSO) as z:
                gso_seq = z["gso"]
        gso_seq = gso_seq.reshape(-1, *gso_seq.shape[-2:])
    anim = Animation(case["grid"], case["goals"], schedule, gso_seq,
                     k_hops=args.nGraphFilterTaps,
                     chosen_agent=args.id_chosenAgent)
    out = anim.render(args.video, fps=args.speed)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
