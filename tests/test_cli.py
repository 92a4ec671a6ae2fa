"""CLI wiring: every reference subcommand must parse and build its
integrator (examples/cli.rs:147-275). Construction only — rendering is
covered by the integrator suites."""
import pytest

from rustlight_tpu.cli import build_parser, build_integrator

COMMANDS = [
    "ao -d 2.0 -c",
    "direct -b 2 -l 2",
    "path -m 8 -n 1 -r 2 -s bsdf",
    "path -x",
    "light-tracing -m 8 -s volume",
    "vpl -m 6 -n2 64 -b 0.1",
    "vol-primitivies -m 6 -n2 128 -p Beams",
    "vol-primitives -p VRL",
    "plane-single -n2 64 -s cmis",
    "plane-single -s discrete_mis",
    "plane-single -s ualpha",
    "uncorrelated-plane-single -s uv",
    "point-normal -s tr_ex",
    "point-normal -s eq_phase_taylor_ex",
    "point-normal -s pn_tr_taylor_ex",
    "point-normal -s eq_best_ex -k 0.5",
    "point-normal -s pn_warp_ex -w TP -W B",
    "gradient-path -m 6 --strategy-recons weighted",
    "gradient-path-explicit --min-survival 0.5",
    "pssmlt -p 0.4 -b 8192",
    "erpt -k -c 32",
    "smcmc --recons-smcmc naive --init independent",
    "smcmc --init mcmc",
]


@pytest.mark.parametrize("cmd", COMMANDS)
def test_subcommand_builds(cmd):
    args = build_parser().parse_args(
        ["cbox", "-n", "2", "-m", "0.01", "-x", "ats"] + cmd.split())
    integ = build_integrator(args)
    assert integ is not None
