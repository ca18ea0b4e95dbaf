"""benchmarks/report.py: the single-source measured-block generator."""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from benchmarks import report  # noqa: E402


@pytest.fixture
def measured():
    return {'native_fps': 3000.0, 'reference_fps': 12.0,
            'speedup': 250.0, 'date': '2026-08-19'}


def test_measured_block_contains_numbers(measured):
    block = report.measured_block(measured)
    assert '3000.0' in block and '12.0' in block and '250.0×' in block
    assert block.startswith('<!-- measured:start -->')
    assert block.endswith('<!-- measured:end -->')


def test_measured_block_includes_quality_when_present(measured,
                                                      tmp_path,
                                                      monkeypatch):
    q = {'map': 0.91, 'mota': 0.5, 'motp': 0.8, 'id_switches': 1,
         'epochs': 40, 'size': 160, 'train_frames': 384,
         'bar': {'map': 0.5, 'mota': 0.0}, 'passed': True}
    qpath = tmp_path / 'QUALITY.json'
    qpath.write_text(json.dumps(q))
    monkeypatch.setattr(report, 'QUALITY', str(qpath))
    block = report.measured_block(measured)
    assert '0.91' in block and 'MOTA' in block
    assert 'not yet generated' not in block


def test_splice_rewrites_only_marked_region(measured, tmp_path):
    doc = tmp_path / 'doc.md'
    doc.write_text('# head\n<!-- measured:start -->\nOLD\n'
                   '<!-- measured:end -->\ntail stays\n')
    assert report.splice(str(doc), report.measured_block(measured))
    text = doc.read_text()
    assert 'OLD' not in text
    assert '# head' in text and 'tail stays' in text
    assert text.count('measured:start') == 1


def test_splice_refuses_unmarked_doc(measured, tmp_path):
    doc = tmp_path / 'doc.md'
    doc.write_text('no markers here\n')
    assert not report.splice(str(doc), 'block')
    assert doc.read_text() == 'no markers here\n'


def test_repo_docs_carry_markers():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for doc in ('BASELINE.md', os.path.join('benchmarks', 'RESULTS.md')):
        text = open(os.path.join(root, doc)).read()
        assert '<!-- measured:start -->' in text, doc
        assert '<!-- measured:end -->' in text, doc
