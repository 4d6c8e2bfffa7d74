"""Interactive viewer: a dependency-free WebGL app over the live simulation.

The reference's GUI (main.cpp:57-187) is an SDL2+ImGui window with camera
orbit/pan/zoom, parameter sliders (gravity, dt, iterations, alpha, log-beta,
gamma, postStabilize), a scene combo, reset, and right-click box spawning.
This module serves the same surface to a browser: the simulation steps
on-device (TPU when available) inside this process; the page polls
``/state`` for body poses plus the debug overlay (stick/slide-colored
contact points, red normal rays, green joint lines, blue spring lines —
manifold.cpp:273-307, joint.cpp:141-161, spring.cpp:92-109) and posts
``/control`` for parameter edits, scene switches, reset and spawning.

Spawning activates a padding body slot (static shapes are preserved, so the
jitted step never retraces); parameter edits re-trace, like recompiling the
C++.

Usage:  python -m avbd3d_tpu.viewer [--scene Stack] [--port 8700]
"""

from __future__ import annotations

import argparse
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from .utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from . import load_scene  # noqa: E402
from .models.scenes import SCENES  # noqa: E402
from .solver import step  # noqa: E402
from .utils.overlay import contact_overlay, joint_overlay, spring_overlay  # noqa: E402

_HTML_PATH = os.path.join(os.path.dirname(__file__), "viewer.html")


class Sim:
    """The live simulation behind the viewer (single-threaded via a lock)."""

    def __init__(self, scene_name: str):
        self.lock = threading.Lock()
        self.running = True
        self.load(scene_name)

    def load(self, scene_name: str):
        scene = load_scene(scene_name)
        self.scene_name = scene_name
        self.world = scene.world
        self.params = scene.params
        self.cap = scene.cap
        self.n_real = scene.n_real

    def set_params(self, kw: dict):
        fields = {
            "dt": float, "iterations": int, "alpha": float, "beta": float,
            "gamma": float, "post_stabilize": bool,
        }
        clean = {}
        for k, f in fields.items():
            if k in kw:
                clean[k] = f(kw[k])
        if "gravity_y" in kw:
            clean["gravity"] = (0.0, float(kw["gravity_y"]), 0.0)
        self.params = self.params.replace(**clean)

    def spawn(self, pos, vel=(0.0, 0.0, 0.0), size=(1.0, 1.0, 1.0),
              density=1.0, friction=0.5):
        """Activate one padding body slot (main.cpp:139-142 semantics)."""
        b = self.world.bodies
        if self.n_real >= b.n:
            return False
        i = self.n_real
        gi, li = i // 128, i % 128
        sz = np.asarray(size, np.float32)
        volume = float(sz.prod())
        mass = density * volume
        inertia = (mass / 12.0) * np.asarray([
            sz[1] ** 2 + sz[2] ** 2,
            sz[0] ** 2 + sz[2] ** 2,
            sz[0] ** 2 + sz[1] ** 2,
        ])
        radius = float(np.linalg.norm(sz)) * 0.5

        def set3(leaf, vals):
            return leaf.at[:, gi, li].set(jnp.asarray(vals, jnp.float32))

        bodies = b.replace(
            pos=set3(b.pos, pos),
            quat=set3(b.quat, (0, 0, 0, 1)),
            linvel=set3(b.linvel, vel),
            angvel=set3(b.angvel, (0, 0, 0)),
            prev_linvel=set3(b.prev_linvel, vel),
            prev_angvel=set3(b.prev_angvel, (0, 0, 0)),
            size=set3(b.size, sz),
            mass=b.mass.at[gi, li].set(mass),
            inv_mass=b.inv_mass.at[gi, li].set(1.0 / mass),
            inertia=set3(b.inertia, inertia),
            inv_inertia=set3(b.inv_inertia, 1.0 / inertia),
            friction=b.friction.at[gi, li].set(friction),
            radius=b.radius.at[gi, li].set(radius),
        )
        # Invalidate the carried step-control block: the refresh gate and
        # the stale-Hessian/ballistic gates read diagnostics lanes 11-15
        # computed on the PRE-spawn state (state.reset_control), so any
        # out-of-band world mutation must force pessimistic gates — a
        # broadphase rebuild and fresh Hessians — on the next step.  The
        # grid tier (>2048 bodies) gates its refresh on anchor deviation
        # instead, so also break that bound: a CONSTANT far anchor gives
        # per-body displacements equal to -pos, whose spread exceeds
        # margin/2 in any non-degenerate scene (a uniform anchor SHIFT
        # would not work — common translations are compensated,
        # ops/broadphase.refresh_or_reuse).
        from .state import reset_control

        bp = self.world.bp.replace(
            anchor=jnp.full_like(self.world.bp.anchor, 1.0e9), slack=0.0)
        self.world = self.world.replace(
            bodies=bodies, bp=bp,
            diagnostics=reset_control(self.world.diagnostics),
        )
        self.n_real += 1
        return True

    def state(self, steps: int):
        if self.running and steps > 0:
            for _ in range(steps):
                self.world = step(self.world, self.params, self.cap)
        w = self.world
        n = self.n_real
        pos = np.asarray(w.bodies.pos_n3[:n])
        quat = np.asarray(w.bodies.quat_n4[:n])
        size = np.asarray(w.bodies._n3(w.bodies.size)[:n])
        mids, normals, sticks = contact_overlay(w)
        joints = joint_overlay(w)
        springs = spring_overlay(w)
        d = jax.device_get(w.diagnostics)
        return {
            "scene": self.scene_name,
            "scenes": list(SCENES),
            "step": int(w.step_index),
            "running": self.running,
            "params": {
                "dt": self.params.dt,
                "gravity_y": self.params.gravity[1],
                "iterations": self.params.iterations,
                "alpha": self.params.alpha,
                "beta": self.params.beta,
                "gamma": self.params.gamma,
                "post_stabilize": self.params.post_stabilize,
            },
            "bodies": {
                "pos": pos.round(5).tolist(),
                "quat": quat.round(5).tolist(),
                "size": size.round(5).tolist(),
            },
            "contacts": {
                "mid": mids.round(4).tolist(),
                "normal": normals.round(4).tolist(),
                "stick": [bool(x) for x in sticks],
            },
            "joints": joints.round(4).tolist(),
            "springs": springs.round(4).tolist(),
            "diag": {
                "maxPen": float(d.max_penetration),
                "maxLin": float(d.max_linear_speed),
                "maxAng": float(d.max_angular_speed),
                "manifolds": int(d.active_manifolds),
                "contacts": int(d.active_contacts),
                "overflow": int(d.pair_overflow),
                "sanitized": int(d.sanitized),
            },
        }


def make_handler(sim: Sim):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path in ("/", "/index.html"):
                with open(_HTML_PATH, "rb") as f:
                    body = f.read()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path.startswith("/state"):
                steps = 1
                if "steps=" in self.path:
                    steps = int(self.path.split("steps=")[1].split("&")[0])
                with sim.lock:
                    self._json(sim.state(steps))
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            length = int(self.headers.get("Content-Length", "0"))
            req = json.loads(self.rfile.read(length) or b"{}")
            cmd = req.get("cmd")
            with sim.lock:
                if cmd == "reset":
                    sim.load(sim.scene_name)
                elif cmd == "scene":
                    sim.load(req["name"])
                elif cmd == "params":
                    sim.set_params(req.get("params", {}))
                elif cmd == "pause":
                    sim.running = not sim.running
                elif cmd == "spawn":
                    sim.spawn(req.get("pos", (0.0, 10.0, 0.0)),
                              req.get("vel", (0.0, 0.0, 0.0)))
                self._json({"ok": True})

    return Handler


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="Stack")
    ap.add_argument("--port", type=int, default=8700)
    args = ap.parse_args()
    sim = Sim(args.scene)
    server = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler(sim))
    print(f"avbd3d_tpu viewer: http://127.0.0.1:{args.port}/  "
          f"(scene {args.scene}, backend {jax.default_backend()})")
    server.serve_forever()


if __name__ == "__main__":
    main()
