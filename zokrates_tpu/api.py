"""One-stop in-process API mirroring the reference's JS provider surface.

The reference exposes the full pipeline in-process through
`ZoKratesProvider` (/root/reference/zokrates_js/index.d.ts:76-107:
compile / computeWitness / setup / universalSetup / setupWithSrs /
generateProof / verify / exportSolidityVerifier / utils.formatProof).
This module is the Python equivalent: in-memory values instead of CLI
artifact files, one import away.

    from zokrates_tpu.api import ZoKratesProvider

    zk = ZoKratesProvider(curve="bn128", scheme="g16")
    art = zk.compile('def main(private field x) -> field { return x * x; }')
    result = zk.compute_witness(art, ["3"])
    keypair = zk.setup(art.program)
    proof = zk.generate_proof(art.program, result.witness, keypair.pk)
    assert zk.verify(keypair.vk, proof)
    contract = zk.export_solidity_verifier(keypair.vk)
"""

from __future__ import annotations

import io
import json
from dataclasses import dataclass
from typing import Any, List, Optional, Sequence

from .schemes.types import Proof, VerificationKey


@dataclass
class ComputationResult:
    """Witness plus ABI-decoded return value (JS `ComputationResult`)."""

    witness: "Witness"
    output: Any

    def witness_bytes(self, field) -> bytes:
        buf = io.BytesIO()
        self.witness.write(buf, field)
        return buf.getvalue()


@dataclass
class SetupKeypair:
    pk: object
    vk: VerificationKey


class ZoKratesProvider:
    """In-process pipeline facade. `curve` and `scheme` play the role of
    the JS provider's `withOptions({curve, scheme})`."""

    def __init__(self, curve: str = "bn128", scheme: str = "g16",
                 stdlib_dir: Optional[str] = None, debug: bool = False):
        self.curve = curve
        self.scheme = scheme
        self.stdlib_dir = stdlib_dir
        self.debug = debug

    def with_options(self, **kw) -> "ZoKratesProvider":
        opts = dict(curve=self.curve, scheme=self.scheme,
                    stdlib_dir=self.stdlib_dir, debug=self.debug)
        opts.update(kw)
        return ZoKratesProvider(**opts)

    # -- compile -----------------------------------------------------------
    def compile(self, source: str, sources: Optional[dict] = None):
        """`.zok` source -> CompilationArtifacts (.prog IR + .abi spec).
        `sources` maps import paths to sources for multi-module programs."""
        from .lang.compile import compile_source, source_resolver

        resolver = source_resolver(
            dict(sources or {}), stdlib_dir=self.stdlib_dir
        )
        return compile_source(
            source,
            curve=self.curve,
            resolver=resolver,
            debug=self.debug,
        )

    # -- witness -----------------------------------------------------------
    def compute_witness(self, artifacts, args: Sequence[Any],
                        vectorized: Optional[bool] = None) -> ComputationResult:
        """ABI-typed args (as in the JS API) -> witness + decoded output."""
        from .abi import decode_outputs, encode_inputs
        from .interp.interpreter import Interpreter
        from .interp.vectorized import VectorizedInterpreter

        prog = getattr(artifacts, "prog", artifacts)
        abi = getattr(artifacts, "abi", None)
        if abi is not None:
            inputs = encode_inputs(list(args), abi["inputs"], prog.field.P)
        else:
            inputs = [int(v) for v in args]
        interp = VectorizedInterpreter() if vectorized else Interpreter()
        witness = interp.execute(prog, inputs)
        output = None
        if abi is not None and abi.get("output") is not None:
            output = decode_outputs(witness.return_values(), abi["output"])
        return ComputationResult(witness=witness, output=output)

    # -- setup -------------------------------------------------------------
    def setup(self, program) -> SetupKeypair:
        from .ir.r1cs import r1cs_from_prog

        m = self._scheme_module()
        if self.scheme == "marlin":
            raise ValueError("marlin needs setup_with_srs(srs, program)")
        pk, vk = m.setup(r1cs_from_prog(program))
        return SetupKeypair(pk=pk, vk=vk)

    def universal_setup(self, size: int):
        """log2 SRS size -> universal SRS (marlin)."""
        from .schemes import marlin

        return marlin.universal_setup(self.curve, 2 ** size)

    def setup_with_srs(self, srs, program) -> SetupKeypair:
        from .ir.r1cs import r1cs_from_prog
        from .schemes import marlin

        pk, vk = marlin.setup_with_srs(srs, r1cs_from_prog(program))
        return SetupKeypair(pk=pk, vk=vk)

    # -- prove / verify ----------------------------------------------------
    def generate_proof(self, program, witness, proving_key) -> Proof:
        from .ir.r1cs import r1cs_from_prog

        m = self._scheme_module()
        return m.prove(r1cs_from_prog(program), proving_key, witness)

    def verify(self, verification_key: VerificationKey, proof: Proof) -> bool:
        if isinstance(verification_key, dict):
            verification_key = VerificationKey.from_json(verification_key)
        if isinstance(proof, dict):
            proof = Proof.from_json(proof)
        m = self._scheme_module(verification_key.scheme)
        return m.verify(verification_key, proof)

    def export_solidity_verifier(self, verification_key: VerificationKey) -> str:
        if isinstance(verification_key, dict):
            verification_key = VerificationKey.from_json(verification_key)
        scheme = verification_key.scheme
        if scheme == "g16" or scheme == "gm17":
            from .schemes.solidity import export_solidity_verifier

            return export_solidity_verifier(verification_key)
        if scheme == "marlin":
            from .schemes.solidity_marlin import export_solidity_verifier

            return export_solidity_verifier(verification_key)
        raise ValueError(f"no solidity template for scheme {scheme}")

    # -- utils -------------------------------------------------------------
    @staticmethod
    def format_proof(proof: Proof) -> str:
        """ABI-token encoding for manual contract calls (JS
        utils.formatProof / reference to_token.rs:36-40)."""
        from .schemes.solidity import proof_to_token

        return proof_to_token(proof.to_json() if isinstance(proof, Proof) else proof)

    def _scheme_module(self, scheme: Optional[str] = None):
        scheme = scheme or self.scheme
        if scheme == "g16":
            from .schemes import groth16 as m
        elif scheme == "gm17":
            from .schemes import gm17 as m
        elif scheme == "marlin":
            from .schemes import marlin as m
        else:
            raise ValueError(f"unknown proving scheme {scheme}")
        return m


def initialize(**kw) -> ZoKratesProvider:
    """Parity shim for the JS `initialize()` entry point."""
    return ZoKratesProvider(**kw)
