"""Browser-facing simulation service (TPU-side analogue of the Pyodide demo).

The reference ships its package as a Pyodide wheel and runs the simulation
*inside* the browser (``examples/pyodide_example/pyodide_example.py:43-109``),
returning ``{times, x_coords, y_coords, tip_displacement}`` JSON for a
Chart.js animation. A TPU cannot run in a browser; the equivalent deployment
shape is a tiny HTTP service: the compiled rollout runs server-side on the
accelerator and the browser receives the same JSON payload, rendered by the
same kind of page (``index.html``).

Run: python examples/web_demo/serve.py [port]   (default 8765)
Then open http://localhost:8765/
"""

from __future__ import annotations

import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CACHE = {}


def run_simulation(n_segments=6, t_final=0.5, dt=0.001, impulse=0.1):
    """The reference's browser workload (``pyodide_example.py:43-109``):
    6-segment linear cantilever, tip impulse, 0.5 s — as one compiled rollout.
    """
    key = (n_segments, t_final, dt, impulse)
    if key in _CACHE:
        return _CACHE[key]

    import jax.numpy as jnp

    from example_utilities import create_csv_file, get_material_properties
    from continuum_robot_tpu.models import DynamicEulerBernoulliBeam
    from continuum_robot_tpu.models.simulate import simulate

    csv = create_csv_file(
        ["linear"] * n_segments, ["FIXED"] + ["NONE"] * (n_segments - 1)
    )
    beam = DynamicEulerBernoulliBeam(csv)
    n = beam.n_pos_states
    tip = jnp.zeros(n).at[-2].set(impulse)

    def u(t):
        return jnp.where(t < 0.01, tip, jnp.zeros(n))

    res = simulate(beam, np.zeros(2 * n), t_final, dt, method="newmark",
                   u=u, substeps=20)
    ys = np.asarray(res.ys)
    w = ys[:, 1:n:3][:, :n_segments]
    props = get_material_properties()
    x_coords = (np.arange(n_segments + 1) * props["length"]).tolist()
    payload = {
        "times": np.asarray(res.ts).tolist(),
        "x_coords": x_coords,
        "y_coords": np.concatenate(
            [np.zeros((ys.shape[0], 1)), w], axis=1
        ).tolist(),
        "tip_displacement": w[:, -1].tolist(),
    }
    os.unlink(csv)
    _CACHE[key] = payload
    return payload


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path.startswith("/simulate"):
            payload = json.dumps(run_simulation()).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)
        elif self.path in ("/", "/index.html"):
            page = open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "index.html"),
                "rb",
            ).read()
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(page)
        else:
            self.send_response(404)
            self.end_headers()

    def log_message(self, fmt, *args):
        pass


def main():
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8765
    print(f"warming up the compiled rollout...")
    run_simulation()
    print(f"serving on http://localhost:{port}/  (GET /simulate for JSON)")
    HTTPServer(("127.0.0.1", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
