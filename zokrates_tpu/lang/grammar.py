r"""Lark grammar for the ZoKrates language.

Covers the surface of the reference pest grammar
(zokrates_parser/src/zokrates.pest:1-195): pragma, imports, consts, type
aliases, structs, generic functions, statements (return / definition /
assertion / for / log / asm), and the full expression grammar with the
reference's operator-precedence table (zokrates_pest_ast/src/lib.rs:44-66):

  ternary < || < && < comparisons < | < ^ < & < shifts < +- < */% < ** <
  unary < postfix

Written fresh for Lark's earley/contextual-lalr model rather than translated
rule-by-rule; the precedence is encoded structurally.
"""

GRAMMAR = r"""
start: pragma? symbol_declaration*

pragma: "#pragma" "curve" NAME

?symbol_declaration: import_directive ";"
                   | const_definition ";"
                   | type_definition ";"
                   | struct_definition
                   | function_definition

import_directive: "from" STRING "import" import_symbol ("," import_symbol)*  -> from_import
                | "import" STRING ("as" NAME)?                               -> main_import
import_symbol: NAME ("as" NAME)?

const_definition: "const" ty NAME "=" expression
type_definition: "type" NAME generics_decl? "=" ty
struct_definition: "struct" NAME generics_decl? "{" (struct_field ";")* "}"
struct_field: ty NAME
generics_decl: "<" NAME ("," NAME)* ">"

function_definition: "def" NAME generics_decl? "(" params ")" ("->" ty)? block
params: (param ("," param)*)?
param: vis? ty "mut"? NAME
vis: "private" -> private | "public" -> public

block: "{" statement* "}"

?statement: for_statement
          | asm_statement
          | return_statement ";"
          | log_statement ";"
          | assert_statement ";"
          | definition_statement ";"

for_statement: "for" ty MUT? NAME "in" expression ".." expression block
MUT: "mut"
return_statement: "return" expression?
log_statement: "log" "(" STRING ("," expression)* ")"
assert_statement: "assert" "(" expression ("," STRING)? ")"
definition_statement: typed_lhs "=" expression -> definition
                    | assignee "=" expression  -> assignment
typed_lhs: ty "mut"? NAME
assignee: NAME assignee_access*
?assignee_access: "[" range_or_expression "]" -> a_index
                | "." NAME                     -> a_member
                | "." DEC_LITERAL              -> a_tuple_member

asm_statement: "asm" "{" asm_inner* "}"
?asm_inner: assignee "<--" expression ";"  -> asm_assign
          | assignee "<==" expression ";"  -> asm_assign_constrain
          | expression "===" expression ";" -> asm_constraint

// ---- types ----
?ty: basic_ty array_suffix+  -> array_ty
   | basic_ty
?basic_ty: "field"          -> t_field
         | "bool"           -> t_bool
         | "u8"             -> t_u8
         | "u16"            -> t_u16
         | "u32"            -> t_u32
         | "u64"            -> t_u64
         | NAME explicit_generics? -> t_user
         | tuple_ty
array_suffix: "[" expression "]"
tuple_ty: "(" ")"                      -> t_tuple_empty
        | "(" ty "," ")"               -> t_tuple_single
        | "(" ty ("," ty)+ ","? ")"    -> t_tuple_multi

explicit_generics: "<" generic_value ("," generic_value)* ">"
?generic_value: literal | NAME -> g_ident | "_" -> g_underscore

// ---- expressions (precedence encoded structurally) ----
?expression: ternary
?ternary: or_expr "?" expression ":" ternary -> ternary_op
        | "if" or_expr if_block "else" if_block -> if_else_op
        | or_expr
if_block: "{" statement* expression "}"
?or_expr: or_expr "||" and_expr -> or_op | and_expr
?and_expr: and_expr "&&" cmp_expr -> and_op | cmp_expr
?cmp_expr: cmp_expr "==" bitor_expr -> eq_op
         | cmp_expr "!=" bitor_expr -> ne_op
         | cmp_expr "<=" bitor_expr -> le_op
         | cmp_expr "<"  bitor_expr -> lt_op
         | cmp_expr ">=" bitor_expr -> ge_op
         | cmp_expr ">"  bitor_expr -> gt_op
         | bitor_expr
?bitor_expr: bitor_expr "|" bitxor_expr -> bitor_op | bitxor_expr
?bitxor_expr: bitxor_expr "^" bitand_expr -> bitxor_op | bitand_expr
?bitand_expr: bitand_expr "&" shift_expr -> bitand_op | shift_expr
?shift_expr: shift_expr "<<" add_expr -> lshift_op
           | shift_expr ">>" add_expr -> rshift_op
           | add_expr
?add_expr: add_expr "+" mul_expr -> add_op
         | add_expr "-" mul_expr -> sub_op
         | mul_expr
?mul_expr: mul_expr "*" unary_expr -> mul_op
         | mul_expr "/" unary_expr -> div_op
         | mul_expr "%" unary_expr -> rem_op
         | unary_expr
?unary_expr: "!" unary_expr -> not_op
           | "-" unary_expr -> neg_op
           | "+" unary_expr -> pos_op
           | pow_expr
?pow_expr: postfix_expr "**" exponent -> pow_op
         | postfix_expr
?exponent: "(" expression ")" | primary

?postfix_expr: postfix_expr "[" range_or_expression "]" -> index_op
             | postfix_expr "(" arguments ")"           -> call_op
             | postfix_expr "::" explicit_generics "(" arguments ")" -> call_generic_op
             | postfix_expr "." NAME                    -> member_op
             | postfix_expr "." DEC_LITERAL             -> tuple_member_op
             | term

?term: "(" expression ")"
     | tuple_expr
     | struct_expr
     | primary
     | array_expr
     | repeat_expr

?primary: NAME       -> ident
        | literal

arguments: (expression ("," expression)*)?

?range_or_expression: range | expression
range: range_from? ".." range_to?
range_from: expression
range_to: expression

tuple_expr: "(" ")"                                    -> tuple_empty
          | "(" expression "," ")"                      -> tuple_single
          | "(" expression ("," expression)+ ","? ")"   -> tuple_multi

struct_expr: NAME "{" (struct_member ("," struct_member)*)? ","? "}"
struct_member: NAME ":" expression

array_expr: "[" (spread_or_expr ("," spread_or_expr)*)? "]"
?spread_or_expr: "..." expression -> spread | expression
repeat_expr: "[" expression ";" expression "]"

?literal: DEC_LITERAL  -> dec_literal
        | HEX_LITERAL  -> hex_literal
        | "true"       -> true_literal
        | "false"      -> false_literal

DEC_LITERAL: /(0|[1-9][0-9]*)(_?(u8|u16|u32|u64|f))?/
HEX_LITERAL.2: /0x[0-9a-fA-F]+/

NAME: /(?!(?:log|assert|as|bool|const|def|else|false|field|for|if|import|from|in|mut|private|public|return|struct|true|type|u8|u16|u32|u64)\b)[a-zA-Z][a-zA-Z0-9_]*|(?:log|assert|as|bool|const|def|else|false|field|for|if|import|from|in|mut|private|public|return|struct|true|type|u8|u16|u32|u64)[a-zA-Z0-9_]+/
STRING: /"[^"]*"/

COMMENT: "//" /[^\n]*/
       | "/*" /(.|\n)*?/ "*/"
%ignore COMMENT
%ignore /[ \t\f\r\n\\]+/
"""
