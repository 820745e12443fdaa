"""Tests for the QPU layer: QuantumCircuit/QASM, backend clients with mocked
HTTP (SURVEY §4: the reference only had live credential-gated tests; mocking
is the upgrade it called for), registry, local backend, and the CLI."""

import json
from unittest import mock

import numpy as np
import pytest

from rocquantum_tpu.qcircuit import QuantumCircuit
from rocquantum_tpu.compiler.qasm_parser import parse_qasm3
from rocquantum_tpu.core import set_target, get_active_backend, available_backends
from rocquantum_tpu.backends import (BackendAuthenticationError,
                                     JobSubmissionError,
                                     ResultRetrievalError)
from rocquantum_tpu.backends.ionq import IonQBackend
from rocquantum_tpu.backends.quantinuum import QuantinuumBackend
from rocquantum_tpu.backends.local import LocalTPUBackend
from rocquantum_tpu.backends.qristal import QuantumBrillianceBackend


class TestQuantumCircuit:
    def test_validation(self):
        with pytest.raises(ValueError):
            QuantumCircuit(0)
        c = QuantumCircuit(2)
        with pytest.raises(ValueError):
            c.h(2)
        with pytest.raises(ValueError):
            c.cx(1, 1)

    def test_bell_qasm(self):
        c = QuantumCircuit(2)
        c.h(0)
        c.cx(0, 1)
        qasm = c.to_qasm()
        assert "OPENQASM 3.0;" in qasm
        assert "qubit[2] q;" in qasm
        assert "h q[0];" in qasm
        assert "cx q[0], q[1];" in qasm
        assert "c = measure q;" in qasm

    def test_double_measure_raises(self):
        c = QuantumCircuit(1)
        c.measure_all()
        with pytest.raises(ValueError):
            c.measure_all()

    def test_qasm_roundtrip(self):
        c = QuantumCircuit(3)
        c.h(0)
        c.rx(0.5, 1)
        c.cx(0, 2)
        c.swap(1, 2)
        ir = parse_qasm3(c.to_qasm())
        assert ir.num_qubits == 3
        names = [op.name for op in ir.ops]
        assert names == ["H", "RX", "CNOT", "SWAP"]
        assert ir.ops[1].params == (0.5,)


class TestQasmParser:
    def test_parse_errors(self):
        with pytest.raises(ValueError):
            parse_qasm3("h q[0];")  # no register
        with pytest.raises(ValueError):
            parse_qasm3("qubit[1] q;\nfrobnicate q[0];")


def _response(status=200, payload=None):
    resp = mock.Mock()
    resp.status_code = status
    resp.json.return_value = payload or {}
    resp.raise_for_status.return_value = None
    return resp


class TestIonQBackendMocked:
    def test_auth_missing_key(self, monkeypatch):
        monkeypatch.delenv("IONQ_API_KEY", raising=False)
        be = IonQBackend()
        with pytest.raises(BackendAuthenticationError):
            be.authenticate()

    def test_job_lifecycle(self, monkeypatch):
        monkeypatch.setenv("IONQ_API_KEY", "test-key")
        be = IonQBackend(backend_name="simulator")
        be.authenticate()
        with mock.patch("requests.post",
                        return_value=_response(payload={"id": "job-1"})) as p:
            job_id = be.submit_job("OPENQASM 3.0;", shots=100)
        assert job_id == "job-1"
        args, kwargs = p.call_args
        assert args[0].endswith("/jobs")
        assert kwargs["headers"]["Authorization"] == "ApiKey test-key"
        assert kwargs["json"]["shots"] == 100
        assert kwargs["json"]["body"]["language"] == "OPENQASM"

        with mock.patch("requests.get", return_value=_response(
                payload={"status": "completed",
                         "data": {"histogram": {"00": 50, "11": 50}}})):
            assert be.get_job_status("job-1") == "completed"
            assert be.get_job_result("job-1") == {"00": 50, "11": 50}

    def test_submit_requires_qasm_string(self, monkeypatch):
        monkeypatch.setenv("IONQ_API_KEY", "k")
        be = IonQBackend()
        be.authenticate()
        with pytest.raises(JobSubmissionError):
            be.submit_job(QuantumCircuit(2), shots=10)

    def test_incomplete_job_result(self, monkeypatch):
        monkeypatch.setenv("IONQ_API_KEY", "k")
        be = IonQBackend()
        be.authenticate()
        with mock.patch("requests.get",
                        return_value=_response(payload={"status": "running"})):
            with pytest.raises(ResultRetrievalError):
                be.get_job_result("job-1")


class TestQuantinuumBackendMocked:
    def test_file_auth(self, tmp_path, monkeypatch):
        creds = tmp_path / "creds.json"
        creds.write_text(json.dumps({"access_token": "tok"}))
        monkeypatch.setenv("CUDAQ_QUANTINUUM_CREDENTIALS", str(creds))
        be = QuantinuumBackend()
        be.authenticate()
        assert be._get_auth_headers() == {"Authorization": "Bearer tok"}

    def test_bad_json(self, tmp_path, monkeypatch):
        creds = tmp_path / "creds.json"
        creds.write_text("{not json")
        monkeypatch.setenv("CUDAQ_QUANTINUUM_CREDENTIALS", str(creds))
        with pytest.raises(BackendAuthenticationError):
            QuantinuumBackend().authenticate()

    def test_missing_env(self, monkeypatch):
        monkeypatch.delenv("CUDAQ_QUANTINUUM_CREDENTIALS", raising=False)
        with pytest.raises(BackendAuthenticationError):
            QuantinuumBackend().authenticate()


class TestLocalBackend:
    def test_bell_roundtrip_circuit_object(self):
        be = LocalTPUBackend()
        be.authenticate()
        c = QuantumCircuit(2)
        c.h(0)
        c.cx(0, 1)
        job = be.submit_job(c, shots=400)
        assert be.get_job_status(job) == "completed"
        hist = be.get_job_result(job)
        assert set(hist) <= {"00", "11"}
        assert sum(hist.values()) == 400

    def test_bell_roundtrip_qasm_string(self):
        be = LocalTPUBackend()
        c = QuantumCircuit(2)
        c.h(0)
        c.cx(0, 1)
        job = be.submit_job(c.to_qasm(), shots=300)
        hist = be.get_job_result(job)
        assert set(hist) <= {"00", "11"}

    def test_unknown_job(self):
        be = LocalTPUBackend()
        with pytest.raises(ResultRetrievalError):
            be.get_job_status("nope")


class TestQristalBackend:
    def test_local_simulator_fallback(self):
        be = QuantumBrillianceBackend()
        c = QuantumCircuit(2)
        c.h(0)
        c.cx(0, 1)
        job = be.submit_job(c, shots=200)
        assert be.get_job_status(job) == "completed"
        hist = be.get_job_result(job)
        assert set(hist) <= {"00", "11"}

    def test_rejects_qasm_string(self):
        be = QuantumBrillianceBackend()
        with pytest.raises(JobSubmissionError):
            be.submit_job("OPENQASM 3.0;", shots=10)


class TestRegistry:
    def test_set_target_local(self):
        set_target("local")
        be = get_active_backend()
        assert isinstance(be, LocalTPUBackend)

    def test_unknown_backend(self):
        with pytest.raises(ValueError):
            set_target("not_a_backend")

    def test_all_reference_backends_registered(self):
        names = set(available_backends())
        for expected in ("ionq", "infleqtion", "pasqal", "quantinuum",
                         "qristal", "iqm", "rigetti", "xanadu", "quera",
                         "orca", "seeqc", "quantum_machines", "alice_bob"):
            assert expected in names


class TestCLI:
    def test_run_local_end_to_end(self, capsys):
        from rocquantum_tpu.cli import main
        rc = main(["run", "--backend", "local", "--shots", "50"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "Results" in out

    def test_list(self, capsys):
        from rocquantum_tpu.cli import main
        rc = main(["list"])
        assert rc == 0
        assert "ionq" in capsys.readouterr().out

    def test_missing_credentials(self, capsys, monkeypatch):
        monkeypatch.delenv("IONQ_API_KEY", raising=False)
        from rocquantum_tpu.cli import main
        rc = main(["run", "--backend", "ionq"])
        assert rc == 1
        assert "IONQ_API_KEY" in capsys.readouterr().out


class TestQasm2Compat:
    def test_parse_openqasm2(self):
        text = "\n".join([
            "OPENQASM 2.0;",
            'include "qelib1.inc";',
            "qreg q[2];",
            "creg c[2];",
            "h q[0];",
            "cx q[0], q[1];",
            "barrier q;",
            "measure q -> c;",
        ])
        ir = parse_qasm3(text)
        assert ir.num_qubits == 2
        assert [op.name for op in ir.ops] == ["H", "CNOT"]


class TestRigettiBackendMocked:
    def _with_fake_boto3(self, monkeypatch):
        import sys, types
        braket = mock.Mock()
        braket.create_quantum_task.return_value = {
            "quantumTaskArn": "arn:task/1"}
        braket.get_quantum_task.return_value = {
            "status": "COMPLETED",
            "outputS3Bucket": "bucket",
            "outputS3Directory": "dir",
        }
        s3_body = mock.Mock()
        s3_body.read.return_value = json.dumps(
            {"measurementProbabilities": {"00": 0.5, "11": 0.5}}).encode()
        s3 = mock.Mock()
        s3.get_object.return_value = {"Body": s3_body}

        fake_boto3 = types.ModuleType("boto3")
        fake_boto3.client = lambda name, region_name=None: (
            braket if name == "braket" else s3)
        fake_botocore = types.ModuleType("botocore")
        fake_exc = types.ModuleType("botocore.exceptions")

        class _E(Exception):
            pass

        fake_exc.BotoCoreError = _E
        fake_exc.ClientError = _E
        fake_botocore.exceptions = fake_exc
        monkeypatch.setitem(sys.modules, "boto3", fake_boto3)
        monkeypatch.setitem(sys.modules, "botocore", fake_botocore)
        monkeypatch.setitem(sys.modules, "botocore.exceptions", fake_exc)
        return braket

    def test_full_lifecycle(self, monkeypatch):
        braket = self._with_fake_boto3(monkeypatch)
        from rocquantum_tpu.backends.rigetti import RigettiBackend
        be = RigettiBackend()
        be.authenticate()
        arn = be.submit_job("OPENQASM 3.0;", shots=100)
        assert arn == "arn:task/1"
        kwargs = braket.create_quantum_task.call_args.kwargs
        assert kwargs["shots"] == 100
        assert "braket.ir.openqasm.program" in kwargs["action"]
        assert be.get_job_status(arn) == "completed"
        assert be.get_job_result(arn) == {"00": 0.5, "11": 0.5}

    def test_unauthenticated_submit(self):
        from rocquantum_tpu.backends.rigetti import RigettiBackend
        be = RigettiBackend()
        with pytest.raises(BackendAuthenticationError):
            be.submit_job("OPENQASM 3.0;", shots=10)


class TestPromotedTypeABackendsMocked:
    """The 7 providers the reference left as TODO skeletons, promoted to
    concrete Type A clients (TypeARestBackend): every one submits a mocked
    job end-to-end through the shared REST lifecycle."""

    CASES = [
        ("alice_bob", "AliceBobBackend", "ALICE_BOB_API_KEY"),
        ("iqm", "IQMBackend", "IQM_TOKEN"),
        ("orca", "OrcaBackend", "ORCA_AUTH_TOKEN"),
        ("quantum_machines", "QuantumMachinesBackend", "QM_API_KEY"),
        ("quera", "QuEraBackend", "QUERA_API_KEY"),
        ("seeqc", "SeeqcBackend", "SEEQC_API_KEY"),
        ("xanadu", "XanaduBackend", "XANADU_CLOUD_KEY"),
    ]

    @pytest.mark.parametrize("mod,cls,env", CASES)
    def test_job_lifecycle(self, monkeypatch, mod, cls, env):
        import importlib
        m = importlib.import_module(f"rocquantum_tpu.backends.{mod}")
        be = getattr(m, cls)()
        monkeypatch.delenv(env, raising=False)
        with pytest.raises(BackendAuthenticationError):
            be.authenticate()
        monkeypatch.setenv(env, "tok")
        be.authenticate()
        with mock.patch("requests.post",
                        return_value=_response(payload={"id": "j-9"})) as p:
            assert be.submit_job("OPENQASM 3.0;", shots=64) == "j-9"
        args, kwargs = p.call_args
        assert args[0].startswith(be.api_endpoint)
        assert args[0].endswith("/jobs")
        assert kwargs["headers"]["Authorization"] == "Bearer tok"
        assert kwargs["json"]["shots"] == 64
        assert kwargs["json"]["program"] == "OPENQASM 3.0;"
        with mock.patch("requests.get", return_value=_response(
                payload={"status": "completed",
                         "data": {"histogram": {"00": 32, "11": 32}}})):
            assert be.get_job_status("j-9") == "completed"
            assert be.get_job_result("j-9") == {"00": 32, "11": 32}

    @pytest.mark.parametrize("mod,cls,env", CASES)
    def test_set_target_accepts(self, monkeypatch, mod, cls, env):
        from rocquantum_tpu import core
        monkeypatch.setenv(env, "tok")  # set_target authenticates
        core.set_target(mod)
        assert core.get_active_backend().backend_name == mod
