"""Command-line interface: artifact-compatible mirror of zokrates_cli.

Subcommands follow zokrates_cli/src/bin.rs:41-62: compile, check, inspect,
compute-witness, setup, universal-setup, generate-proof, verify,
export-verifier, print-proof, profile, generate-smtlib2, plus mpc/nova
command groups. Artifacts: `out` (binary IR), `abi.json`, `witness` (+
`witness.json`), `proving.key`, `verification.key`, `proof.json`,
`universal_setup.dat`.

Usage: python -m zokrates_tpu <subcommand> [args]   (or the `zokrates-tpu`
entry point).
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

DEFAULT_STDLIB = os.path.join(os.path.dirname(os.path.abspath(__file__)), "stdlib")

CURVES = ["bn128", "bls12_381", "bls12_377", "bw6_761"]
SCHEMES = ["g16", "gm17", "marlin"]
BACKENDS = ["ark", "bellman"]


def _err(msg):
    print(f"Error: {msg}", file=sys.stderr)
    sys.exit(1)


# ---------------------------------------------------------------------------
# compile / check / inspect / profile
# ---------------------------------------------------------------------------


def cmd_compile(args):
    from .lang.compile import compile_file
    from .ir.serialize import serialize

    try:
        art = compile_file(
            args.input,
            curve=args.curve,
            stdlib_dir=args.stdlib_path,
            debug=args.debug,
        )
    except Exception as e:
        _err(f"compilation failed:\n\n{e}")
    prog = art.prog

    data = serialize(prog)
    with open(args.output, "wb") as f:
        f.write(data)
    with open(args.abi_spec, "w") as f:
        json.dump(art.abi, f, indent=2)
    if args.r1cs:
        from .interop.circom import write_r1cs

        with open(args.r1cs, "wb") as f:
            write_r1cs(f, prog)
    n = prog.constraint_count()
    print(f"Compiled code written to '{args.output}'")
    print(f"Number of constraints: {n}")


def cmd_check(args):
    from .lang.compile import compile_file

    try:
        compile_file(args.input, curve=args.curve, stdlib_dir=args.stdlib_path)
    except Exception as e:
        _err(f"check failed:\n\n{e}")
    print("Program checked, no errors found.")


def _load_prog(path):
    from .ir.serialize import deserialize

    with open(path, "rb") as f:
        return deserialize(f.read())


def cmd_inspect(args):
    prog = _load_prog(args.input)
    print(f"curve:       {prog.curve}")
    print(f"constraints: {prog.constraint_count()}")
    print(f"arguments:   {len(prog.arguments)} ({sum(1 for a in prog.arguments if not a.private)} public)")
    print(f"returns:     {prog.return_count}")
    if args.ztf:
        from .ir.program import var_name

        for s in prog.statements:
            print(s)


def cmd_profile(args):
    """Per-source-span constraint heat map (reference
    zokrates_profiler/src/lib.rs:39-51: % of constraints per span,
    descending; unattributed constraints print as '???')."""
    prog = _load_prog(args.input)
    from collections import Counter
    from .ir.program import Constraint

    heat = Counter()
    total = 0
    for s in prog.statements:
        if isinstance(s, Constraint):
            total += 1
            heat[s.span] += 1

    mods = prog.module_map or []

    def show(span):
        if span is None:
            return "???"
        mid, line, col = span
        mod = mods[mid] if mid < len(mods) else f"<module {mid}>"
        return f"{mod}:{line}:{col}"

    print(f"Total constraints: {total}")
    for span, c in heat.most_common():
        print(f"{c / max(1, total) * 100:>5.2f}% : {show(span)}  ({c})")


# ---------------------------------------------------------------------------
# compute-witness
# ---------------------------------------------------------------------------


def cmd_compute_witness(args):
    from .abi import encode_inputs
    from .interp.interpreter import Interpreter
    from .interp.vectorized import VectorizedInterpreter
    from .ir.witness import Witness

    prog = _load_prog(args.input)
    F = prog.field

    if args.abi:
        with open(args.abi_spec) as f:
            abi = json.load(f)
        if args.stdin:
            values = json.load(sys.stdin)
        else:
            values = json.loads(args.arguments or "[]")
        inputs = encode_inputs(values, abi["inputs"], F.P)
    else:
        raw = args.arguments.split() if args.arguments else []
        inputs = [int(v) for v in raw]

    # levelized device generator for big circuits on TPU (>= 4096
    # constraints), scalar walk otherwise: on CPU the per-level functional
    # witness updates copy more than the scalar walk computes, and for
    # small circuits dispatch overhead dominates; both paths are
    # bit-identical (tests/test_vectorized.py)
    import jax

    if args.vectorized or (
        args.vectorized is None
        and prog.constraint_count() >= 4096
        and jax.default_backend() == "tpu"
    ):
        interp = VectorizedInterpreter()
    else:
        interp = Interpreter()
    try:
        witness = interp.execute(prog, inputs, log_stream=sys.stdout)
    except Exception as e:
        _err(f"execution failed: {e}")

    with open(args.output, "wb") as f:
        witness.write(f, F)
    if args.json:
        with open(args.output + ".json", "w") as f:
            f.write(witness.to_json())
    if args.circom_witness:
        from .interop.circom import write_wtns

        with open(args.circom_witness, "wb") as f:
            write_wtns(f, prog, witness)
    print("Witness:")
    print(witness.format_outputs())
    print(f"Witness file written to '{args.output}'")


# ---------------------------------------------------------------------------
# setup / prove / verify
# ---------------------------------------------------------------------------


def _scheme_module(scheme):
    if scheme == "g16":
        from .schemes import groth16 as m
    elif scheme == "gm17":
        from .schemes import gm17 as m
    elif scheme == "marlin":
        from .schemes import marlin as m
    else:
        _err(f"unknown proving scheme {scheme}")
    return m


def cmd_setup(args):
    from .ir.r1cs import r1cs_from_prog

    prog = _load_prog(args.input)
    m = _scheme_module(args.proving_scheme)
    r1cs = r1cs_from_prog(prog)
    if args.proving_scheme == "marlin":
        with open(args.universal_setup_path, "rb") as f:
            srs = pickle.load(f)
        pk, vk = m.setup_with_srs(srs, r1cs)
    else:
        pk, vk = m.setup(r1cs)
    with open(args.proving_key_path, "wb") as f:
        pickle.dump(pk, f)
    with open(args.verification_key_path, "w") as f:
        json.dump(vk.to_json(), f, indent=2)
    print(f"Setup completed")
    print(f"Proving key written to '{args.proving_key_path}'")
    print(f"Verification key written to '{args.verification_key_path}'")


def cmd_universal_setup(args):
    from .schemes import marlin

    srs = marlin.universal_setup(args.curve, 2 ** args.size)
    with open(args.universal_setup_path, "wb") as f:
        pickle.dump(srs, f)
    print(f"Universal setup written to '{args.universal_setup_path}'")


def cmd_generate_proof(args):
    from .ir.r1cs import r1cs_from_prog
    from .ir.witness import Witness

    prog = _load_prog(args.input)
    F = prog.field
    m = _scheme_module(args.proving_scheme)
    witness_paths = [args.witness] + list(args.extra_witnesses or [])
    witnesses = []
    for wp in witness_paths:
        with open(wp, "rb") as f:
            witnesses.append(Witness.read(f, F))
    with open(args.proving_key_path, "rb") as f:
        pk = pickle.load(f)
    r1cs = r1cs_from_prog(prog)
    if len(witnesses) > 1:
        # multi-proof batch axis (groth16.prove_batch): one device
        # dispatch for all witnesses; proof i lands at <proof-path>.<i>
        if args.proving_scheme != "g16":
            _err("--also-witness batching is only supported for g16")
        proofs = m.prove_batch(r1cs, pk, witnesses)
        for i, proof in enumerate(proofs):
            path = f"{args.proof_path}.{i}"
            with open(path, "w") as f:
                json.dump(proof.to_json(), f, indent=2)
        print(
            f"{len(proofs)} proofs written to "
            f"'{args.proof_path}.0'..'{args.proof_path}.{len(proofs) - 1}'"
        )
        return
    proof = m.prove(r1cs, pk, witnesses[0])
    with open(args.proof_path, "w") as f:
        json.dump(proof.to_json(), f, indent=2)
    print(f"Proof written to '{args.proof_path}'")


def cmd_verify(args):
    from .schemes.types import Proof, VerificationKey

    with open(args.verification_key_path) as f:
        vk = VerificationKey.from_json(json.load(f))
    with open(args.proof_path) as f:
        proof = Proof.from_json(json.load(f))
    if vk.scheme != proof.scheme or vk.curve != proof.curve:
        _err(f"verification key ({vk.scheme}/{vk.curve}) and proof ({proof.scheme}/{proof.curve}) do not match")
    m = _scheme_module(vk.scheme)
    if m.verify(vk, proof):
        print("PASSED")
    else:
        print("FAILED")
        sys.exit(1)


def cmd_print_proof(args):
    with open(args.proof_path) as f:
        proof = json.load(f)
    fmt = args.format
    points = proof["proof"]
    if fmt == "json":
        print(json.dumps(points, indent=2))
    else:  # remix / abi-tokenized
        from .schemes.solidity import proof_to_token

        print(proof_to_token(proof))


def cmd_export_verifier(args):
    from .schemes.solidity import export_solidity_verifier
    from .schemes.types import VerificationKey

    with open(args.verification_key_path) as f:
        vk = VerificationKey.from_json(json.load(f))
    code = export_solidity_verifier(vk)
    with open(args.output, "w") as f:
        f.write(code)
    print(f"Verifier exported to '{args.output}'")


def cmd_generate_smtlib2(args):
    from .ir.smtlib2 import to_smtlib2

    prog = _load_prog(args.input)
    out = to_smtlib2(prog)
    with open(args.output, "w") as f:
        f.write(out)
    print(f"SMT-LIB2 formula written to '{args.output}'")




def _mpc_load(path: str, curve: str):
    """Load an MPC params file: phase2 byte format (reference-compatible,
    produced by mpc-init --radix-path) or our pickle container. phase2
    files start with an uncompressed G1 point; pickles with \\x80."""
    with open(path, "rb") as f:
        head = f.read(1)
        f.seek(0)
        if head == b"\x80":
            return pickle.load(f), "native"
        from .interop import bellman_mpc

        return bellman_mpc.MPCParameters.read(curve, f), "phase2"


def _mpc_save(params, fmt: str, path: str):
    with open(path, "wb") as f:
        if fmt == "phase2":
            params.write(f)
        else:
            pickle.dump(params, f)


def cmd_mpc_init(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import mpc

    prog = _load_prog(args.input)
    r1cs = r1cs_from_prog(prog)
    if args.radix_path:
        # reference path (mpc init -r phase1radix2m{n}): phase-1-anchored
        # parameters in the phase2 byte format
        from .interop import bellman_mpc

        n = 1 << max(1, (r1cs.num_constraints + r1cs.num_instance - 1).bit_length())
        with open(args.radix_path, "rb") as f:
            radix = bellman_mpc.Phase1Radix.read(r1cs.curve, f, n)
        params = bellman_mpc.initialize(r1cs, radix)
        with open(args.output, "wb") as f:
            params.write(f)
    else:
        params = mpc.init(r1cs)
        with open(args.output, "wb") as f:
            pickle.dump(params, f)
    print(f"Initial parameters written to '{args.output}'")


def cmd_mpc_contribute(args):
    from .schemes import mpc

    params, fmt = _mpc_load(args.input, args.curve)
    if fmt == "phase2":
        from .interop import bellman_mpc

        h = bellman_mpc.contribute(params, entropy=args.entropy)
    else:
        h = mpc.contribute(params, entropy=args.entropy)
    _mpc_save(params, fmt, args.output)
    print(f"Contribution hash: 0x{h.hex()}")
    print(f"Parameters written to '{args.output}'")


def cmd_mpc_beacon(args):
    from .schemes import mpc

    params, fmt = _mpc_load(args.input, args.curve)
    if fmt == "phase2":
        from .interop import bellman_mpc

        h = bellman_mpc.beacon(params, args.beacon_hash, args.iterations)
    else:
        h = mpc.beacon(params, args.beacon_hash, args.iterations)
    _mpc_save(params, fmt, args.output)
    print(f"Beacon contribution hash: 0x{h.hex()}")
    print(f"Parameters written to '{args.output}'")


def cmd_mpc_verify(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import mpc

    r1cs = r1cs_from_prog(_load_prog(args.circuit))
    params, fmt = _mpc_load(args.input, r1cs.curve)
    if fmt == "phase2":
        from .interop import bellman_mpc

        if not args.radix_path:
            _err("phase2-format params require -r/--radix-path to verify")
        n = 1 << max(1, (r1cs.num_constraints + r1cs.num_instance - 1).bit_length())
        with open(args.radix_path, "rb") as f:
            radix = bellman_mpc.Phase1Radix.read(r1cs.curve, f, n)
        try:
            hashes = bellman_mpc.verify(params, r1cs, radix)
        except ValueError as e:
            print(f"Contribution verification failed: {e}")
            sys.exit(1)
        print(f"Transcript contains {len(hashes)} contribution(s):")
        for i, h in enumerate(hashes):
            print(f"  {i}: 0x{h.hex()}")
        print("Contributions verified")
        return
    if mpc.verify(params, r1cs):
        print(f"Transcript contains {len(params.contributions)} contribution(s):")
        for i, c in enumerate(params.contributions):
            print(f"  {i}: 0x{c.transcript.hex()}")
        print("Contributions verified")
    else:
        print("Contribution verification failed")
        sys.exit(1)


def cmd_mpc_export(args):
    from .schemes import mpc

    params, fmt = _mpc_load(args.input, args.curve)
    if fmt == "phase2":
        from .interop import bellman_mpc
        from .ir.r1cs import r1cs_from_prog

        r1cs = r1cs_from_prog(_load_prog(args.circuit))
        pk, vk = bellman_mpc.export_keypair(params, r1cs)
    else:
        pk, vk = mpc.export_keys(params)
    with open(args.proving_key_path, "wb") as f:
        pickle.dump(pk, f)
    with open(args.verification_key_path, "w") as f:
        json.dump(vk.to_json(), f, indent=2)
    print(f"Keypair exported to '{args.proving_key_path}', '{args.verification_key_path}'")

def _todo(feature):
    def run(args):
        _err(f"{feature} is not available yet in this build")

    return run


# ---------------------------------------------------------------------------
# nova (IVC by folding; reference zokrates_bellperson/src/nova.rs)
# ---------------------------------------------------------------------------


def cmd_nova_setup(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import nova

    prog = _load_prog(args.input)
    r1cs = r1cs_from_prog(prog)
    try:
        params = nova.setup(prog, r1cs)
    except nova.NovaError as e:
        _err(str(e))
    with open(args.output, "wb") as f:
        pickle.dump(params, f)
    print(f"Nova public parameters written to '{args.output}'")


def cmd_nova_prove(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import nova

    prog = _load_prog(args.input)
    r1cs = r1cs_from_prog(prog)
    with open(args.params, "rb") as f:
        params = pickle.load(f)
    z0 = [int(a, 0) for a in args.arguments]
    resume = None
    if args.cont:
        with open(args.output, "rb") as f:
            resume = pickle.load(f)
    try:
        proof = nova.prove(prog, r1cs, params, z0, args.steps, resume=resume)
    except nova.NovaError as e:
        _err(str(e))
    with open(args.output, "wb") as f:
        pickle.dump(proof, f)
    print(f"Nova proof of {proof.num_steps} step(s) written to '{args.output}'")
    print(f"Final state: {proof.zN}")


def cmd_nova_verify(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import nova

    prog = _load_prog(args.input)
    r1cs = r1cs_from_prog(prog)
    with open(args.params, "rb") as f:
        params = pickle.load(f)
    with open(args.proof, "rb") as f:
        proof = pickle.load(f)
    if isinstance(proof, nova.CompressedNovaProof):
        ok = nova.verify_compressed(r1cs, params, proof)
    else:
        ok = nova.verify(r1cs, params, proof)
    if ok:
        print(f"PASSED ({proof.num_steps} step(s): {proof.z0} -> {proof.zN})")
    else:
        print("FAILED")
        sys.exit(1)


def cmd_nova_compress(args):
    from .ir.r1cs import r1cs_from_prog
    from .schemes import nova

    prog = _load_prog(args.input)
    r1cs = r1cs_from_prog(prog)
    with open(args.params, "rb") as f:
        params = pickle.load(f)
    with open(args.proof, "rb") as f:
        proof = pickle.load(f)
    if isinstance(proof, nova.CompressedNovaProof):
        _err("proof is already compressed")
    cproof = nova.compress(r1cs, params, proof)
    with open(args.output, "wb") as f:
        pickle.dump(cproof, f)
    print(f"Compressed (zk-finalized) Nova proof written to '{args.output}'")


# ---------------------------------------------------------------------------
# argument parsing
# ---------------------------------------------------------------------------


def make_parser():
    p = argparse.ArgumentParser(
        prog="zokrates-tpu", description="ZoKrates-compatible zkSNARK toolbox, TPU-native"
    )
    sub = p.add_subparsers(dest="command", required=True)

    c = sub.add_parser("compile", help="Compiles into a runnable constraint system")
    c.add_argument("-i", "--input", required=True)
    c.add_argument("-o", "--output", default="out")
    c.add_argument("-s", "--abi-spec", default="abi.json")
    c.add_argument("-c", "--curve", default="bn128", choices=CURVES + ["pallas", "vesta"])
    c.add_argument("--stdlib-path", default=None)
    c.add_argument("--debug", action="store_true")
    c.add_argument("--r1cs", default=None, help="write a circom .r1cs file")
    c.set_defaults(fn=cmd_compile)

    c = sub.add_parser("check", help="Checks a program for errors")
    c.add_argument("-i", "--input", required=True)
    c.add_argument("-c", "--curve", default="bn128", choices=CURVES + ["pallas", "vesta"])
    c.add_argument("--stdlib-path", default=None)
    c.set_defaults(fn=cmd_check)

    c = sub.add_parser("inspect", help="Inspects a compiled program")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("--ztf", action="store_true", help="print human readable statements")
    c.set_defaults(fn=cmd_inspect)

    c = sub.add_parser("profile", help="Profiles a compiled program")
    c.add_argument("-i", "--input", default="out")
    c.set_defaults(fn=cmd_profile)

    c = sub.add_parser("compute-witness", help="Calculates a witness")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-s", "--abi-spec", default="abi.json")
    c.add_argument("-o", "--output", default="witness")
    c.add_argument("-a", "--arguments", default=None, help="arguments (space separated, or JSON with --abi)")
    c.add_argument("--abi", action="store_true")
    c.add_argument("--stdin", action="store_true")
    c.add_argument("--json", action="store_true", help="also write witness.json")
    c.add_argument("--circom-witness", default=None)
    g = c.add_mutually_exclusive_group()
    g.add_argument(
        "--vectorized",
        action="store_true",
        default=None,
        help="force the levelized device witness generator",
    )
    g.add_argument(
        "--no-vectorized",
        dest="vectorized",
        action="store_false",
        help="force the scalar interpreter",
    )
    c.set_defaults(fn=cmd_compute_witness)

    c = sub.add_parser("setup", help="Performs a trusted setup")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-p", "--proving-key-path", default="proving.key")
    c.add_argument("-v", "--verification-key-path", default="verification.key")
    c.add_argument("-s", "--proving-scheme", default="g16", choices=SCHEMES)
    c.add_argument("-b", "--backend", default="ark", choices=BACKENDS)
    c.add_argument("-u", "--universal-setup-path", default="universal_setup.dat")
    c.set_defaults(fn=cmd_setup)

    c = sub.add_parser("universal-setup", help="Universal setup (marlin)")
    c.add_argument("-c", "--curve", default="bn128", choices=CURVES)
    c.add_argument("-n", "--size", type=int, default=17, help="log2 size")
    c.add_argument("-u", "--universal-setup-path", default="universal_setup.dat")
    c.set_defaults(fn=cmd_universal_setup)

    c = sub.add_parser("generate-proof", help="Generates a proof")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-w", "--witness", default="witness")
    c.add_argument(
        "--also-witness",
        dest="extra_witnesses",
        action="append",
        metavar="PATH",
        help="additional witness files: prove all of them as ONE batched "
        "device dispatch (g16); proof i is written to <proof-path>.<i>",
    )
    c.add_argument("-p", "--proving-key-path", default="proving.key")
    c.add_argument("-j", "--proof-path", default="proof.json")
    c.add_argument("-s", "--proving-scheme", default="g16", choices=SCHEMES)
    c.add_argument("-b", "--backend", default="ark", choices=BACKENDS)
    c.set_defaults(fn=cmd_generate_proof)

    c = sub.add_parser("verify", help="Verifies a proof")
    c.add_argument("-v", "--verification-key-path", default="verification.key")
    c.add_argument("-j", "--proof-path", default="proof.json")
    c.set_defaults(fn=cmd_verify)

    c = sub.add_parser("export-verifier", help="Exports a Solidity verifier")
    c.add_argument("-i", "--verification-key-path", default="verification.key")
    c.add_argument("-o", "--output", default="verifier.sol")
    c.set_defaults(fn=cmd_export_verifier)

    c = sub.add_parser("print-proof", help="Prints a proof")
    c.add_argument("-j", "--proof-path", default="proof.json")
    c.add_argument("-f", "--format", default="json", choices=["json", "remix"])
    c.set_defaults(fn=cmd_print_proof)

    c = sub.add_parser("generate-smtlib2", help="Exports constraints as SMT-LIB2")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-o", "--output", default="out.smt2")
    c.set_defaults(fn=cmd_generate_smtlib2)

    c = sub.add_parser("mpc-init", help="MPC ceremony: initialize parameters")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-o", "--output", default="mpc.params")
    c.add_argument(
        "-r", "--radix-path", default=None,
        help="phase1radix2m{n} file (Powers of Tau output); produces "
        "reference-compatible phase2-format parameters",
    )
    c.set_defaults(fn=cmd_mpc_init)
    c = sub.add_parser("mpc-contribute", help="MPC ceremony: contribute randomness")
    c.add_argument("-i", "--input", default="mpc.params")
    c.add_argument("-o", "--output", default="mpc.params")
    c.add_argument("-e", "--entropy", default=None)
    c.add_argument("-c", "--curve", default="bn128")
    c.set_defaults(fn=cmd_mpc_contribute)
    c = sub.add_parser("mpc-beacon", help="MPC ceremony: apply a random beacon")
    c.add_argument("-i", "--input", default="mpc.params")
    c.add_argument("-o", "--output", default="mpc.params")
    c.add_argument("-h2", "--hash", dest="beacon_hash", required=True)
    c.add_argument("-n", "--iterations", type=int, default=10)
    c.add_argument("-c", "--curve", default="bn128")
    c.set_defaults(fn=cmd_mpc_beacon)
    c = sub.add_parser("mpc-verify", help="MPC ceremony: verify the transcript")
    c.add_argument("-i", "--input", default="mpc.params")
    c.add_argument("-c", "--circuit", default="out")
    c.add_argument(
        "-r", "--radix-path", default=None,
        help="phase1radix file (required for phase2-format params)",
    )
    c.set_defaults(fn=cmd_mpc_verify)
    c = sub.add_parser("mpc-export", help="MPC ceremony: export final keypair")
    c.add_argument("-i", "--input", default="mpc.params")
    c.add_argument("-p", "--proving-key-path", default="proving.key")
    c.add_argument("-v", "--verification-key-path", default="verification.key")
    c.add_argument("-c", "--curve", default="bn128")
    c.add_argument("--circuit", default="out")
    c.set_defaults(fn=cmd_mpc_export)
    c = sub.add_parser("nova-setup", help="Nova IVC: generate public parameters")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-o", "--output", default="nova.params")
    c.set_defaults(fn=cmd_nova_setup)
    c = sub.add_parser("nova-prove", help="Nova IVC: fold N steps into one proof")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-p", "--params", default="nova.params")
    c.add_argument("-a", "--arguments", nargs="+", required=True, help="initial state z0")
    c.add_argument("-n", "--steps", type=int, default=1)
    c.add_argument("-o", "--output", default="nova.proof")
    c.add_argument("--continue", dest="cont", action="store_true",
                   help="fold more steps onto the existing proof file")
    c.set_defaults(fn=cmd_nova_prove)
    c = sub.add_parser("nova-verify", help="Nova IVC: verify a folded proof")
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-p", "--params", default="nova.params")
    c.add_argument("-j", "--proof", default="nova.proof")
    c.set_defaults(fn=cmd_nova_verify)
    c = sub.add_parser(
        "nova-compress",
        help="Nova IVC: zk-finalize a proof (blinded accumulator opening)",
    )
    c.add_argument("-i", "--input", default="out")
    c.add_argument("-p", "--params", default="nova.params")
    c.add_argument("-j", "--proof", default="nova.proof")
    c.add_argument("-o", "--output", default="nova.proof.compressed")
    c.set_defaults(fn=cmd_nova_compress)

    return p


def main(argv=None):
    # allow forcing the JAX platform (the axon TPU plugin ignores the
    # standard JAX_PLATFORMS env var): ZOKRATES_TPU_PLATFORM=cpu|tpu|axon
    plat = os.environ.get("ZOKRATES_TPU_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    args = make_parser().parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
