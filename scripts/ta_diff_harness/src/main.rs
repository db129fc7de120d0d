// Differential harness: reads tab-separated ops on stdin, prints reference
// results on stdout. Protocol per line:
//   lev <a_hex> <b_hex>               -> dist
//   lev_k <a_hex> <b_hex> <k>         -> dist | "none"
//   rdam <a_hex> <b_hex>              -> dist
//   lev_exp <a_hex> <b_hex>           -> dist
//   ham <a_hex> <b_hex>               -> dist
//   lev_k_costs <a> <b> <k> <mis> <gap> <sg> <tc(-1=no)> -> dist | none
//   trace <a> <b> <k> <mis> <gap> <sg> <tc>  -> "e:c,e:c,..." | none
//   search_lev <needle> <hay> <k> <all|best> <anchored01> <mis> <gap> <sg> <tc>
//        -> "s-e-k;s-e-k;..." (empty ok)
//   search_ham <needle> <hay> <k> <all|best>  -> same
use std::io::{self, BufRead, Write};
use triple_accel::*;
use triple_accel::levenshtein::*;
use triple_accel::hamming::*;

fn unhex(s: &str) -> Vec<u8> {
    if s == "-" { return Vec::new(); }
    (0..s.len()).step_by(2)
        .map(|i| u8::from_str_radix(&s[i..i + 2], 16).unwrap())
        .collect()
}

fn fmt_edit(e: &EditType) -> &'static str {
    match e {
        EditType::Match => "match",
        EditType::Mismatch => "mismatch",
        EditType::AGap => "a_gap",
        EditType::BGap => "b_gap",
        EditType::Transpose => "transpose",
    }
}

fn main() {
    let stdin = io::stdin();
    let stdout = io::stdout();
    let mut out = stdout.lock();
    for line in stdin.lock().lines() {
        let line = line.unwrap();
        let line = line.trim_end_matches('\n');
        let p: Vec<&str> = line.split('\t').collect();
        if p.is_empty() || p[0].is_empty() { continue; }
        let res: String = match p[0] {
            "lev" => levenshtein(&unhex(p[1]), &unhex(p[2])).to_string(),
            "rdam" => rdamerau(&unhex(p[1]), &unhex(p[2])).to_string(),
            "lev_exp" => levenshtein_exp(&unhex(p[1]), &unhex(p[2])).to_string(),
            "ham" => hamming(&unhex(p[1]), &unhex(p[2])).to_string(),
            "lev_k" => match levenshtein_simd_k(&unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap()) {
                Some(d) => d.to_string(),
                None => "none".to_string(),
            },
            "lev_k_costs" => {
                let tc: i32 = p[7].parse().unwrap();
                let costs = EditCosts::new(
                    p[4].parse().unwrap(), p[5].parse().unwrap(),
                    p[6].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                match levenshtein_simd_k_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(), false, costs) {
                    Some((d, _)) => d.to_string(),
                    None => "none".to_string(),
                }
            },
            "trace" => {
                let tc: i32 = p[7].parse().unwrap();
                let costs = EditCosts::new(
                    p[4].parse().unwrap(), p[5].parse().unwrap(),
                    p[6].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                match levenshtein_simd_k_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(), true, costs) {
                    Some((d, Some(tr))) => {
                        let s: Vec<String> = tr.iter()
                            .map(|e| format!("{}:{}", fmt_edit(&e.edit), e.count))
                            .collect();
                        format!("{}|{}", d, s.join(","))
                    },
                    _ => "none".to_string(),
                }
            },
            "search_lev" => {
                let tc: i32 = p[9].parse().unwrap();
                let costs = EditCosts::new(
                    p[6].parse().unwrap(), p[7].parse().unwrap(),
                    p[8].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                let st = if p[4] == "best" { SearchType::Best } else { SearchType::All };
                let anchored = p[5] == "1";
                let v: Vec<Match> = levenshtein_search_simd_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(),
                    st, costs, anchored).collect();
                v.iter().map(|m| format!("{}-{}-{}", m.start, m.end, m.k))
                    .collect::<Vec<_>>().join(";")
            },
            "lev_k_costs_naive" => {
                let tc: i32 = p[7].parse().unwrap();
                let costs = EditCosts::new(
                    p[4].parse().unwrap(), p[5].parse().unwrap(),
                    p[6].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                match levenshtein_naive_k_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(), false, costs) {
                    Some((d, _)) => d.to_string(),
                    None => "none".to_string(),
                }
            },
            "rdam_naive" => {
                levenshtein_naive_with_opts(&unhex(p[1]), &unhex(p[2]), false,
                    RDAMERAU_COSTS).0.to_string()
            },
            "trace_naive" => {
                let tc: i32 = p[7].parse().unwrap();
                let costs = EditCosts::new(
                    p[4].parse().unwrap(), p[5].parse().unwrap(),
                    p[6].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                match levenshtein_naive_k_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(), true, costs) {
                    Some((d, Some(tr))) => {
                        let s: Vec<String> = tr.iter()
                            .map(|e| format!("{}:{}", fmt_edit(&e.edit), e.count))
                            .collect();
                        format!("{}|{}", d, s.join(","))
                    },
                    _ => "none".to_string(),
                }
            },
            "search_lev_naive" => {
                let tc: i32 = p[9].parse().unwrap();
                let costs = EditCosts::new(
                    p[6].parse().unwrap(), p[7].parse().unwrap(),
                    p[8].parse().unwrap(),
                    if tc < 0 { None } else { Some(tc as u8) });
                let st = if p[4] == "best" { SearchType::Best } else { SearchType::All };
                let anchored = p[5] == "1";
                let v: Vec<Match> = levenshtein_search_naive_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(),
                    st, costs, anchored).collect();
                v.iter().map(|m| format!("{}-{}-{}", m.start, m.end, m.k))
                    .collect::<Vec<_>>().join(";")
            },
            "search_ham" => {
                let st = if p[4] == "best" { SearchType::Best } else { SearchType::All };
                let v: Vec<Match> = hamming_search_naive_with_opts(
                    &unhex(p[1]), &unhex(p[2]), p[3].parse().unwrap(), st).collect();
                v.iter().map(|m| format!("{}-{}-{}", m.start, m.end, m.k))
                    .collect::<Vec<_>>().join(";")
            },
            _ => "ERR".to_string(),
        };
        writeln!(out, "{}", res).unwrap();
    }
}
