#!/usr/bin/env python3
"""Golden-fixture generator (test-time tool, not shipped library code).

Extracts the reference's pattern tables and pure text functions
(/root/reference/app.py:85-201,434-451,505-533,538-540) via `ast` and
executes them under CPython `re` — the ground truth for the byte-identity
contract (SURVEY.md SS5.2). The INPUTS below are authored here; the
OUTPUTS are produced by the reference's own code. Results are frozen to
src/test/resources/golden/golden.json and consumed by the ScalaTest
golden suite. Deterministic: no randomness, no wall clock.

Usage: python3 tools/gen_golden.py
"""
import ast
import json
import os
import re
import sys

REF = "/root/reference/app.py"
OUT = os.path.join(os.path.dirname(__file__), "..",
                   "src", "test", "resources", "golden", "golden.json")

WANTED_ASSIGNS = {"PERUVIAN_LEGAL_CORRECTIONS", "PERUVIAN_LEGAL_PATTERNS",
                  "PERUVIAN_KEY_PATTERNS"}
WANTED_FUNCS = {"correct_peruvian_legal_text", "extract_peruvian_legal_fields",
                "get_page_separator"}


def load_reference():
    src = open(REF, encoding="utf-8").read()
    tree = ast.parse(src)
    nodes = []
    for node in tree.body:
        if isinstance(node, ast.Assign) and any(
                isinstance(t, ast.Name) and t.id in WANTED_ASSIGNS
                for t in node.targets):
            nodes.append(node)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name) \
                and node.target.id in WANTED_ASSIGNS:
            nodes.append(node)
        elif isinstance(node, ast.FunctionDef) and node.name in WANTED_FUNCS:
            nodes.append(node)
    mod = ast.Module(body=nodes, type_ignores=[])
    import typing
    env = {"re": re, "Dict": typing.Dict, "List": typing.List,
           "Tuple": typing.Tuple, "Any": typing.Any,
           "Optional": typing.Optional}
    exec(compile(mod, REF, "exec"), env)
    return env


def build_inputs(env):
    """Authored input corpus. Names are stable test ids."""
    corrections = env["PERUVIAN_LEGAL_CORRECTIONS"]
    inputs = {}

    # --- FIXTURES.md micro pairs -------------------------------------
    micro = {
        "m01_fiscalia_prov": "fiscalia  provincial\n\n\npenal",
        "m02_single_lf": "a\nb",
        "m03_blank_line": "a\n\nb",
        "m04_carpeta": "CARPETA  FISCAL  1234567890-2024-123-12",
        "m05_art": "ART. 122",
        "m06_art_ord": "art 5º",
        "m07_plates": "ABC 123 y XY 1234",
        "m08_date_long": "12 DE MARZO DEL 2024",
        "m09_publico": "publico PUBLICO PúBlIcÓ".replace("Ó", "O"),
        "m10_expediente_mangle": "EXPEDlENTE N° 01234-2024-0-0401-JR-PE",
        "m11_fecha_sep": "FECHA: 03-04-2024",
        "m12_inciso": "Inc. 3 y Art 15",
        "m13_titulo": "titulo II del codigo",
        "m14_resolucion": "resolucion n 05",
        "m15_resolucion_deg": "RESOLUCIÓN Nº 12-2024",
        "m16_exp_short": "EXP. N 01234-2024-0-0401-JR-PE",
        "m17_date_short_nums": "del 01/2/2024 al 3-12-2025",
        "m18_plate_lower": "placa abc 123 y xy-1234",
        "m19_art_nodot": "art 99° y ART. 100",
        "m20_ws_tabs": "a\tb  c\t\td",
    }
    inputs.update(micro)

    # --- FIXTURES.md document pairs ----------------------------------
    inputs["docA_legal_header"] = (
        "MlNlSTERlO PUBLICO\nFlSCALÍA  PROVlNClAL  PENAL  CORPORATlVA "
        "DE CAYLLOMA\nDlSTRlTO FlSCAL DE AREQUlPA\nCARPETA FlSCAL: "
        "5006014504-2024-215-0\n\nPROVlDENCIA N° 01-2024\nChivay, 15 de "
        "Marzo del 2024\n\nIMPUTADO: JUAN CARLOS QUISPE MAMANI\nAGRAVIADO: "
        "MARIA LOPEZ DE TORRES\nDELITO: CONTRA EL PATRIMONIO - USURPACION\n"
        "Art. 202 Inc. 2 del CODIGO PENAL\nvehículo de placa ABC 123")
    inputs["docB_expediente"] = (
        "EXPEDlENTE N° 01234-2024-0-0401-JR-PE\nRESOLUCION N° 05\n"
        "JUZGADO PENAL UNIPERSONAL DE AREQUIPA\nJUEZ: PEDRO SANCHEZ RIVERA\n"
        "FISCAL: ANA TORRES DELGADO\n\n\n\nfecha: 03/04/2024")
    inputs["docC_whitespace"] = (
        "texto   con    espacios\tmultiples\r\ny saltos\r\n\r\n\r\nde linea")
    inputs["docD_fields_raw"] = (
        "CARPETA FISCAL: 5006014504-2024-215-0\n"
        "EXPEDIENTE N° 01234-2024-0-0401-JR-PE")
    inputs["docE_full_sentencia"] = (
        "CORTE SUPERIOR DE JUSTICIA DE AREQUIPA\nJUZGADO civil DE CAMANA\n"
        "expediente n° 00456-2023-0-0402-JP-CI\nresolucion numero tres\n"
        "MAGISTRADO: LUISA FERNANDEZ CACERES\nFISCALÍA SUPREMA PENAL DE LIMA\n"
        "DISTRITO FISCAL DE LIMA SUR\nINVESTIGADO: CARLOS RAMOS PAREDES\n"
        "AGRAVlADO: ROSA QUISPE HUAMAN\nDELlTO: CONTRA LA VIDA\n"
        "el 7 de Agosto del 2023 se emitio\nart. 106 inc. 1\n"
        "investigacion preliminar segun articulo 334")
    inputs["docF_hybrid_noise"] = (
        "PENAЛ de carcel CONTRA el investigado.\nCÖNTRA EL HONOR\n"
        "APROPIACION ILICITA en agravio\nAPROPIACIÓN ILÍCITA del bien\n"
        "PROCEDlMlENTO especial\nUSURPACION agravada")

    # --- every dict entry, upper and lower, embedded in context ------
    for i, wrong in enumerate(corrections):
        inputs[f"dict{i:02d}_{re.sub(chr(92)+'W', '_', wrong)}"] = (
            f"xx {wrong} yy\nzz {wrong.lower()} ww")

    # --- every pattern tuple exercised -------------------------------
    pat_inputs = {
        "pat00_carpeta": "CARPETA FISCAL 1234567890-2024-1-1",
        "pat01_carpeta_l": "CARPETA FlSCAL: 9876543210-2023-215-10",
        "pat02_exp": "EXPEDIENTE Nº 12345-2024-12-ABCD-PE",
        "pat03_exp_l": "EXPEDlENTE. N 0123-2023-1-JR-CI",
        "pat04_res": "RESOLUCIÓN N° 7",
        "pat05_res_plain": "RESOLUCION N 12 34",
        "pat06_fisc_prov": "FISCALÍA PROVINCIAL FAMILIA",
        "pat07_fisc_prov_l": "FlSCALÍA PROVlNClAL ClVlL",
        "pat08_date_slash": "el 1-1-1999 y el 31/12/2024",
        "pat09_date_long": "5 de junio de 2021 y 15 de Octubre del 2022",
        "pat10_plate3": "BUS XYZ-999 visto",
        "pat11_plate2": "auto AB 1234 visto",
        "pat12_art": "Art.15 y art  16º",
        "pat13_inc": "Inc 4 e inciso... Inc. 12",
        "pat14_spaces": "a  b   c",
        "pat15_newlines": "a\n\n\n\nb",
    }
    inputs.update(pat_inputs)

    # --- every field pattern exercised (fields on raw text) ----------
    field_inputs = {
        "f_carpeta2": "carpeta flscal 1111111111-2020-5-2",
        "f_fiscalia_g2_discard": "FISCALÍA PROVINCIAL PENAL CORPORATIVA DE CAYLLOMA DISTRITO FISCAL",
        "f_fiscalia_l": "FlSCALÍA SUPERlOR MIXTA DE CUSCO",
        "f_distrito": "DISTRITO FISCAL DE MADRE DE DIOS Y MAS",
        "f_distrito_l": "DlSTRlTO FlSCAL DE PUNO",
        "f_delito_contra": "acusado CONTRA EL HONOR de la victima",
        "f_delito_usurp": "delito de USURPACIÓN agravada",
        "f_delito_aprop": "APROPIACIÓN ILÍCITA del bien",
        "f_imputado_stop_delito": "IMPUTADO: PEDRO PABLO KUCZYNSKI DELITO: COHECHO",
        "f_imputado_l": "lMPUTADO: MARIA ELENA CHAVEZ\notro",
        "f_investigado": "INVESTIGADO: JOSE LUIS CABRERA AGRAVIADO: ANA MARIA",
        "f_agraviado_l": "AGRAVlADO: TOMAS PEREZ lMPUTADO: OTRO",
        "f_fecha_fecha": "FECHA: 15/08/2024 presentado",
        "f_fecha_bare": "visto el 9-10-2023 en autos",
        "f_juzgado_de": "JUZGADO MIXTO DE ILAVE",
        "f_juzgado_penal": "JUZGADO PENAL COLEGIADO 2 DE AREQUIPA",
        "f_juez_s": "JUES: RAUL TORRES VEGA\n",
        "f_magistrado": "MAGISTRADO: CARMEN DIAZ FLORES",
        "f_fiscal_colon": "FISCAL: JORGE SALAS PENA",
        "f_fecha_norm_trigger": "el 15 de Marzo del 2024 FECHA: 01/01/2020",
        "f_value_trailing_junk": "DELITO: ROBO AGRAVADO ||##\nmas",
        "f_value_empty": "IMPUTADO:  \nDELITO: HURTO",
        "f_no_fields": "texto sin campos legales de interes",
    }
    inputs.update(field_inputs)

    # --- adversarial regex-semantics corners -------------------------
    inputs.update({
        "a_multiline_dollar": "DELITO: ROBO\nDELITO: HURTO\nfin",
        "a_dollar_no_newline": "FISCAL: MARIA GOMEZ",
        "a_dollar_trailing_nl": "FISCAL: MARIA GOMEZ\n",
        "a_ordinal_mix": "Art. 1º Art 2° art.3 ART  4",
        "a_res_trailing_space_digits": "RESOLUCION N° 12 567 mas",
        "a_exp_gap": "EXP.  N°   01234-2024-0-0401-JR-PE",
        "a_exp_colon": "EXPEDIENTE N°: 01234-2024-0-0401-JR-PE",
        "a_fiscalia_distrito_inline": "FISCALÍA PROVINCIAL PENAL DE LIMA DISTRITO FISCAL DE LIMA",
        "a_value_pipes_mid": "DELITO: ROBO|AGRAVADO\nfin",
        "a_value_hash_only": "DELITO: ####\nDELITO: HURTO",
        "a_imputado_comma": "IMPUTADO: PEREZ, JUAN CARLOS, AGRAVIADO: OTRO",
        "a_overlapping_stops": "IMPUTADO: ANA DELITO AGRAVIADO: LUIS",
        "a_date_adjacent": "12-12-201200 y 1-1-19999",
        "a_plate_boundaries": "XABC 123 ABC 123X ABC  123",
        "a_inc_inside_word": "zinc 5 e Inca 7 e Inc 9",
        "a_case_folding_special": "pUbLiCo PÚblico PúBLICO",
        "a_cyrillic_word": "PENAЛ PENAЛES ЛPENAЛ",
        "a_empty_after_clean": " | # ",
        "a_tabs_in_fields": "JUEZ:\tROSA\tDIAZ\tLUNA\nfin",
        "a_nbsp_mid": "CARPETA FISCAL 1234567890-2024-1-1",
        "a_juzgado_end": "JUZGADO MIXTO",
        "a_juez_vs_jues": "JUES: A B\nJUEZ: C D",
        "a_carpeta_short_id": "CARPETA FISCAL: 123456789-2024-1-1",
        "a_exp_word_class": "EXP N° 0123-2024-99-ABCD-ZZ",
        "a_double_match_first_wins": "FECHA: 01/01/2020 y 5 de Mayo del 2021",
        "a_fecha_norm_long_first": "5 de Mayo del 2021 y FECHA: 01/01/2020",
        "a_vertical_tab": "ab  c",
        "a_formfeed": "ab\n\nc",
    })

    # --- unicode / boundary torture ----------------------------------
    inputs.update({
        "t_nbsp": "PUBLICO PENAL",
        "t_word_boundary_accent": "ÍPUBLICO PUBLICOÍ PUBLICOS",
        "t_cyrillic_boundary": "ЛPENAL PENAЛА PENAЛ",
        "t_underscore_boundary": "_PUBLICO_ PUBLICO_X X_PUBLICO",
        "t_digits_boundary": "PUBLICO1 1PUBLICO",
        "t_empty": "",
        "t_only_ws": " \t\r\n  ",
        "t_crlf": "linea1\r\nlinea2\rlinea3\nlinea4",
        "t_strip_edges": "  \n hola mundo \t ",
        "t_art_in_word": "parte 5 Marte 7 artesano",
        "t_date_in_id": "serie 12-11-2023-99 fin",
        "t_mixed_case_keys": "Fiscalia Ministerio Publico Codigo Articulo Titulo",
        "t_repeat_keys": "PUBLICO PUBLICO PUBLICO CODIGO CODIGO",
        "t_long_line": ("CONTRA EL PATRIMONIO " * 40).strip(),
        # CPython IGNORECASE extra-cases folding: dotless ı and dotted İ
        # both match I/i in patterns (sre extra cases), Kelvin sign K
        # matches K/k. Pins the engine's char-wise fold scanner.
        "t_fold_dotless_i": "Fıscalia PUBLıCO mınısterıo",
        "t_fold_dotted_I": "FİSCALIA fİscalia PUBLİCO",
        "t_fold_kelvin": "KODIGO CODIGO K",
        "t_fold_long_s": "ſiscalia FIſCALIA",
        # Quirk 2 PIPELINE-LEVEL consequence (app.py:130 x app.py:153):
        # the unanchored date rule rewrites "24-0-0401" inside the
        # expediente id to "24/0/0401", so the id survives raw
        # extraction but the normalize->extract pipeline LOSES it.
        "chain_q2_date_destroys_expediente":
            "EXPEDIENTE N° 01234-2024-0-0401-JR-PE seguido contra el imputado",
    })
    return inputs


def add_real_docs(inputs):
    """Seed a few bodies from the driver's documents.parquet (read-only)."""
    try:
        import pyarrow.parquet as pq
        t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                          columns=["doc_id", "text", "lang"])
        rows = t.to_pylist()
        rows.sort(key=lambda r: r["doc_id"])
        picked = 0
        for r in rows:
            if picked >= 8:
                break
            txt = (r["text"] or "")[:1500]
            if len(txt) < 50:
                continue
            inputs[f"corpus_doc{r['doc_id']}_{r['lang']}"] = txt
            picked += 1
    except Exception as e:  # pyarrow is driver-side; tolerate absence
        print(f"warn: skipping real-doc seeds: {e}", file=sys.stderr)
    return inputs


def main():
    env = load_reference()
    correct = env["correct_peruvian_legal_text"]
    extract = env["extract_peruvian_legal_fields"]
    sep = env["get_page_separator"]

    inputs = add_real_docs(build_inputs(env))
    cases = []
    for name in sorted(inputs):
        raw = inputs[name]
        normalized = correct(raw)
        cases.append({
            "name": name,
            "input": raw,
            "normalized": normalized,
            # fields over normalized text = the pipeline's order (app.py:638,768)
            "fields": extract(normalized),
            # fields over raw input = unit test for the extractor alone
            "fields_raw": extract(raw),
        })

    seps = [{"page": p, "total": t, "sep": sep(p, t)}
            for (p, t) in [(1, 1), (2, 10), (10, 10), (1, 3), (999, 1000)]]

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w", encoding="utf-8") as f:
        json.dump({"cases": cases, "separators": seps}, f,
                  ensure_ascii=False, indent=1, sort_keys=True)
    print(f"wrote {len(cases)} cases + {len(seps)} separators -> {OUT}")


if __name__ == "__main__":
    main()
