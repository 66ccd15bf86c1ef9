"""Brainf**k lexer/compiler/VM producing the five-table execution trace
(reference: examples/brainfuck/vm.rs).

The simulator is inherently sequential and cheap (one Python step per VM
cycle); all field-heavy work (extension columns, LDE, hashing) happens on
device downstream."""

from __future__ import annotations

import numpy as np

from ...fields.scalar import P, Fp
from . import tables as T

OP_INC_PTR = ord(">")
OP_DEC_PTR = ord("<")
OP_INC = ord("+")
OP_DEC = ord("-")
OP_WRITE = ord(".")
OP_READ = ord(",")
OP_LOOP_BEGIN = ord("[")
OP_LOOP_END = ord("]")

OPCODES = [OP_INC_PTR, OP_DEC_PTR, OP_INC, OP_DEC, OP_WRITE, OP_READ,
           OP_LOOP_BEGIN, OP_LOOP_END]


def lex(source: str) -> list[int]:
    return [ord(c) for c in source if ord(c) in OPCODES]


def compile_program(source: str) -> list[int]:
    """Opcode stream with loop targets inlined after '[' and ']'."""
    program: list[int] = []
    stack: list[int] = []
    for op in lex(source):
        program.append(op)
        if op == OP_LOOP_BEGIN:
            program.append(0)  # placeholder: position after matching ]
            stack.append(len(program) - 1)
        elif op == OP_LOOP_END:
            last = stack.pop()
            program.append(last + 1)
            program[last] = len(program)
    assert not stack, "unbalanced loops"
    return program


def ceil_pow2(v: int) -> int:
    return 1 << (v - 1).bit_length() if v > 1 else 1


def simulate(source: str, input_bytes: bytes = b""):
    """Run the program; returns (tables dict of numpy uint64 row-major
    arrays padded to a common power-of-two length, output bytes)."""
    program = compile_program(source)
    tape = np.zeros(1024, dtype=np.int64)

    cycle = 0
    ip = 0
    mp = 0
    curr_instr = program[0]
    next_instr = program[1] if len(program) > 1 else 0

    in_pos = 0
    output = bytearray()

    processor_rows = []
    instruction_rows = []
    input_rows = []
    output_rows = []

    # program load rows
    for i in range(len(program)):
        nxt = program[i + 1] if i + 1 < len(program) else 0
        instruction_rows.append([i, program[i], nxt])

    def mem_val_inv(v: int) -> int:
        return pow(v, P - 2, P) if v else 0

    while ip < len(program):
        mem_val = int(tape[mp])
        processor_rows.append([
            cycle, ip, curr_instr, next_instr, mp, mem_val,
            mem_val_inv(mem_val), int(curr_instr == 0)])
        instruction_rows.append([ip, curr_instr, next_instr])

        if curr_instr == OP_LOOP_BEGIN:
            ip = program[ip + 1] if tape[mp] == 0 else ip + 2
        elif curr_instr == OP_LOOP_END:
            ip = program[ip + 1] if tape[mp] != 0 else ip + 2
        elif curr_instr == OP_DEC_PTR:
            ip += 1
            mp -= 1
        elif curr_instr == OP_INC_PTR:
            ip += 1
            mp += 1
        elif curr_instr == OP_INC:
            ip += 1
            tape[mp] = (tape[mp] + 1) % 256
        elif curr_instr == OP_DEC:
            ip += 1
            tape[mp] = (tape[mp] - 1) % 256
        elif curr_instr == OP_WRITE:
            ip += 1
            output.append(int(tape[mp]))
            output_rows.append([int(tape[mp])])
        elif curr_instr == OP_READ:
            ip += 1
            tape[mp] = input_bytes[in_pos]
            in_pos += 1
            input_rows.append([int(tape[mp])])
        else:
            raise ValueError(f"unrecognized instruction at ip {ip}")

        cycle += 1
        curr_instr = program[ip] if ip < len(program) else 0
        next_instr = program[ip + 1] if ip + 1 < len(program) else 0

    # final-state rows
    mem_val = int(tape[mp])
    processor_rows.append([
        cycle, ip, curr_instr, next_instr, mp, mem_val,
        mem_val_inv(mem_val), int(curr_instr == 0)])
    instruction_rows.append([ip, curr_instr, next_instr])

    instruction_rows.sort(key=lambda r: r[0])
    memory_rows = derive_memory_rows(processor_rows)

    n = ceil_pow2(max(len(processor_rows), len(memory_rows),
                      len(instruction_rows), len(input_rows),
                      len(output_rows)))

    pad_processor(processor_rows, n)
    pad_memory(memory_rows, n)
    pad_instruction(instruction_rows, n)
    input_rows += [[0]] * (n - len(input_rows))
    output_rows += [[0]] * (n - len(output_rows))

    tables = {
        "processor": np.asarray(processor_rows, dtype=np.uint64),
        "memory": np.asarray(memory_rows, dtype=np.uint64),
        "instruction": np.asarray(instruction_rows, dtype=np.uint64),
        "input": np.asarray(input_rows, dtype=np.uint64),
        "output": np.asarray(output_rows, dtype=np.uint64),
    }
    return tables, bytes(output)


def derive_memory_rows(processor_rows):
    """Memory table = non-padding processor rows sorted by (mp, cycle), with
    dummy rows filling cycle gaps (vm.rs:338-381)."""
    rows = [[r[0], r[4], r[5], 0] for r in processor_rows if r[2] != 0]
    rows.sort(key=lambda r: (r[1], r[0]))
    i = 0
    while i < len(rows) - 1:
        curr, nxt = rows[i], rows[i + 1]
        if curr[1] == nxt[1] and curr[0] + 1 != nxt[0]:
            rows.insert(i + 1, [curr[0] + 1, curr[1], curr[2], 1])
        i += 1
    return rows


def pad_processor(rows, n):
    while len(rows) < n:
        last = rows[-1]
        rows.append([last[0] + 1, last[1], 0, 0, last[4], last[5], last[6], 1])


def pad_memory(rows, n):
    while len(rows) < n:
        last = rows[-1]
        rows.append([last[0] + 1, last[1], last[2], 1])


def pad_instruction(rows, n):
    last_ip = rows[-1][0]
    while len(rows) < n:
        rows.append([last_ip, 0, 0])
